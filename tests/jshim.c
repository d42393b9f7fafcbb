/* jshim: libjpeg helper for conformance tests.
 *   jshim toarith in.jpg out.jpg  - lossless transcode to arithmetic coding
 *   jshim tohuff  in.jpg out.jpg  - lossless transcode to huffman coding
 *   jshim dump    in.jpg          - print w h ncomp then per-component
 *                                   quantized DCT coefficients (zigzag-free,
 *                                   natural row-major block order)
 */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
#ifndef NO_PNG
#include <png.h>
#endif

static int g_restart = 0;
static int g_progressive = 0;

static void transcode(const char *src, const char *dst, boolean arith) {
  struct jpeg_decompress_struct sinfo;
  struct jpeg_compress_struct dinfo;
  struct jpeg_error_mgr serr, derr;
  FILE *fi = fopen(src, "rb"), *fo = fopen(dst, "wb");
  if (!fi || !fo) { perror("open"); exit(2); }
  sinfo.err = jpeg_std_error(&serr);
  jpeg_create_decompress(&sinfo);
  jpeg_stdio_src(&sinfo, fi);
  jpeg_read_header(&sinfo, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&sinfo);
  dinfo.err = jpeg_std_error(&derr);
  jpeg_create_compress(&dinfo);
  jpeg_copy_critical_parameters(&sinfo, &dinfo);
  dinfo.arith_code = arith;
  dinfo.optimize_coding = arith ? FALSE : TRUE;
  if (g_restart) dinfo.restart_interval = (unsigned int)g_restart;
  if (g_progressive) jpeg_simple_progression(&dinfo);
  jpeg_stdio_dest(&dinfo, fo);
  jpeg_write_coefficients(&dinfo, coefs);
  jpeg_finish_compress(&dinfo);
  jpeg_destroy_compress(&dinfo);
  jpeg_finish_decompress(&sinfo);
  jpeg_destroy_decompress(&sinfo);
  fclose(fi); fclose(fo);
}

static void dump(const char *src) {
  struct jpeg_decompress_struct s;
  struct jpeg_error_mgr e;
  FILE *fi = fopen(src, "rb");
  if (!fi) { perror("open"); exit(2); }
  s.err = jpeg_std_error(&e);
  jpeg_create_decompress(&s);
  jpeg_stdio_src(&s, fi);
  jpeg_read_header(&s, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&s);
  printf("%d %d %d\n", s.image_width, s.image_height, s.num_components);
  for (int ci = 0; ci < s.num_components; ci++) {
    jpeg_component_info *c = &s.comp_info[ci];
    printf("comp %d %d %d\n", ci, (int)c->width_in_blocks, (int)c->height_in_blocks);
    for (JDIMENSION r = 0; r < c->height_in_blocks; r++) {
      JBLOCKARRAY rows = (*s.mem->access_virt_barray)
        ((j_common_ptr)&s, coefs[ci], r, 1, FALSE);
      for (JDIMENSION b = 0; b < c->width_in_blocks; b++) {
        for (int k = 0; k < DCTSIZE2; k++)
          printf("%d ", rows[0][b][k]);
        printf("\n");
      }
    }
  }
  jpeg_finish_decompress(&s);
  jpeg_destroy_decompress(&s);
  fclose(fi);
}

#ifndef NO_PNG
static void pngdump(const char *src) {
  FILE *fi = fopen(src, "rb");
  if (!fi) { perror("open"); exit(2); }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) { fprintf(stderr, "libpng error\n"); exit(3); }
  png_init_io(png, fi);
  /* EXPAND: palette->RGB, tRNS->alpha, <8-bit gray->8 (bit replication) */
  png_read_png(png, info, PNG_TRANSFORM_EXPAND, NULL);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int ch = png_get_channels(png, info);
  int depth = png_get_bit_depth(png, info);
  printf("%u %u %d %d\n", w, h, ch, depth);
  png_bytepp rows = png_get_rows(png, info);
  for (png_uint_32 y = 0; y < h; y++) {
    for (png_uint_32 x = 0; x < w * ch; x++) {
      if (depth == 16) {
        int v = (rows[y][2*x] << 8) | rows[y][2*x+1];
        printf("%d ", v);
      } else {
        printf("%d ", rows[y][x]);
      }
    }
    printf("\n");
  }
  png_destroy_read_struct(&png, &info, NULL);
  fclose(fi);
}

#endif /* NO_PNG */

int main(int argc, char **argv) {
  if (argc >= 4 && argv[1][0] == 't' && argv[1][2] == 'a') {
    if (argc >= 5) g_restart = atoi(argv[4]);
    if (argc >= 6) g_progressive = atoi(argv[5]);
    transcode(argv[2], argv[3], TRUE); return 0;
  }
  if (argc >= 4 && argv[1][0] == 't') { transcode(argv[2], argv[3], FALSE); return 0; }
  if (argc >= 3 && argv[1][0] == 'd') { dump(argv[2]); return 0; }
#ifndef NO_PNG
  if (argc >= 3 && argv[1][0] == 'p') { pngdump(argv[2]); return 0; }
#endif
  if (argc >= 2 && argv[1][0] == 'c') {
#ifndef NO_PNG
    printf("jpeg png\n");
#else
    printf("jpeg\n");
#endif
    return 0;
  }
  fprintf(stderr, "usage: jshim toarith|tohuff in out | jshim dump in\n");
  return 1;
}
