"""Property-based pins (hypothesis) for the closed-form oracle math.

The driver's oracles are only as good as the algebra behind them; the
risky derivation is the unique:length emission log, where the DuckDB
oracle uses a closed form ("an event expires iff its key recurs later
OR >= n distinct other keys occur after it") instead of replaying the
FIFO. These tests pit that closed form against a brute-force simulation
of the reference's buffer (UniqueLengthWindowProcessor.java:148-166)
over random streams — no Spark session needed, hundreds of cases."""

from hypothesis import given, settings
from hypothesis import strategies as st


def fifo_replay(seq: list[str], n: int) -> list[tuple[int, str]]:
    """Brute-force simulation of the reference FIFO: returns the
    emission log as (event_index, channel) pairs."""
    buffer: dict = {}  # key -> event index, insertion-ordered
    out: list[tuple[int, str]] = []
    for i, k in enumerate(seq):
        if k in buffer:
            out.append((buffer.pop(k), "expired"))
        elif len(buffer) == n:
            out.append((buffer.pop(next(iter(buffer))), "expired"))
        buffer[k] = i
        out.append((i, "current"))
    return out


def closed_form_expired(seq: list[str], n: int) -> set[int]:
    """The oracle's characterization (__spark_entry__._length_emissions_oracle):
    event i expires iff its key occurs again later, or at least n
    distinct OTHER keys occur after position i."""
    expired = set()
    for i, k in enumerate(seq):
        if k in seq[i + 1:]:
            expired.add(i)
        elif len({d for d in seq[i + 1:] if d != k}) >= n:
            expired.add(i)
    return expired


@settings(max_examples=300, deadline=None)
@given(
    seq=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=40),
    n=st.integers(min_value=1, max_value=6),
)
def test_length_emissions_closed_form_matches_fifo_replay(seq, n):
    replay = fifo_replay(seq, n)
    # every arrival emits exactly one current row
    assert [i for i, ch in replay if ch == "current"] == list(range(len(seq)))
    # each event expires at most once, and exactly the closed-form set
    expired = [i for i, ch in replay if ch == "expired"]
    assert len(expired) == len(set(expired))
    assert set(expired) == closed_form_expired(seq, n)


@settings(max_examples=200, deadline=None)
@given(
    seq=st.lists(st.sampled_from("abcde"), min_size=0, max_size=30),
    n=st.integers(min_value=1, max_value=4),
)
def test_final_buffer_is_n_most_recent_distinct_keys(seq, n):
    """The invariant the closed form rests on: the buffer is always
    exactly the n most-recently-occurring distinct keys, each mapped
    to its latest event (because a replace moves the key to the back)."""
    buffer: dict = {}
    for i, k in enumerate(seq):
        if k in buffer:
            buffer.pop(k)
        elif len(buffer) == n:
            buffer.pop(next(iter(buffer)))
        buffer[k] = i
    latest: dict = {}
    for i, k in enumerate(seq):
        latest[k] = i
    top_n = sorted(latest.values())[-n:] if latest else []
    assert sorted(buffer.values()) == sorted(top_n)
