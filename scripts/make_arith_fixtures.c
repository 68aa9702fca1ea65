/* Generate REAL arithmetic-coded JPEG fixtures with libjpeg, plus a
 * losslessly-transcoded Huffman twin of each (jpeg_read_coefficients ->
 * jpeg_write_coefficients, the jpegtran shape): both files carry the SAME
 * quantized DCT coefficients, so a correct decoder must produce
 * byte-identical pixels for the pair. The Huffman twin decodes through the
 * repo's already-fixture-verified Huffman path, which makes the pair an
 * independent exact oracle for the arithmetic entropy layer (no shared
 * code, no shared misreading, no IDCT tolerance).
 *
 * Build/run:
 *   gcc -O2 -o /tmp/make_arith_fixtures scripts/make_arith_fixtures.c -ljpeg
 *   /tmp/make_arith_fixtures tests/fixtures
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) {
  fprintf(stderr, "FATAL: %s\n", msg);
  exit(1);
}

/* deterministic test raster: smooth gradient + structured detail */
static unsigned char px_at(int y, int x, int c) {
  int v = (y * 5 + x * 3 + c * 11 + ((x / 8) * (y / 8) * 7) % 64) % 256;
  return (unsigned char)v;
}

static void encode(const char *path, int w, int h, int gray, int progressive,
                   int restart, int arith) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *f = fopen(path, "wb");
  if (!f) die("fopen out");
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = gray ? 1 : 3;
  cinfo.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, 85, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.restart_interval = restart;
  if (progressive) jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  {
    int stride = w * cinfo.input_components;
    unsigned char *row = malloc(stride);
    while (cinfo.next_scanline < cinfo.image_height) {
      int y = cinfo.next_scanline, x, c;
      for (x = 0; x < w; x++)
        for (c = 0; c < cinfo.input_components; c++)
          row[x * cinfo.input_components + c] = px_at(y, x, c);
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
    free(row);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
}

/* jpegtran-style lossless transcode: same coefficients, Huffman entropy */
static void transcode_to_huffman(const char *src_path, const char *dst_path,
                                 int force_baseline_scan) {
  struct jpeg_decompress_struct srcinfo;
  struct jpeg_compress_struct dstinfo;
  struct jpeg_error_mgr jsrcerr, jdsterr;
  jvirt_barray_ptr *coefs;
  FILE *in = fopen(src_path, "rb");
  FILE *out = fopen(dst_path, "wb");
  if (!in || !out) die("fopen transcode");
  srcinfo.err = jpeg_std_error(&jsrcerr);
  jpeg_create_decompress(&srcinfo);
  dstinfo.err = jpeg_std_error(&jdsterr);
  jpeg_create_compress(&dstinfo);
  jpeg_stdio_src(&srcinfo, in);
  (void)jpeg_read_header(&srcinfo, TRUE);
  coefs = jpeg_read_coefficients(&srcinfo);
  jpeg_copy_critical_parameters(&srcinfo, &dstinfo);
  dstinfo.arith_code = FALSE;
  dstinfo.optimize_coding = TRUE;
  if (force_baseline_scan) {
    dstinfo.scan_info = NULL; /* single interleaved sequential scan */
    dstinfo.num_scans = 0;
  }
  jpeg_stdio_dest(&dstinfo, out);
  jpeg_write_coefficients(&dstinfo, coefs);
  jpeg_finish_compress(&dstinfo);
  jpeg_destroy_compress(&dstinfo);
  (void)jpeg_finish_decompress(&srcinfo);
  jpeg_destroy_decompress(&srcinfo);
  fclose(in);
  fclose(out);
}

int main(int argc, char **argv) {
  char a[512], b[512];
  const char *dir = argc > 1 ? argv[1] : "tests/fixtures";

  /* sequential arithmetic, grayscale */
  snprintf(a, sizeof a, "%s/arith_seq_gray.jpg", dir);
  snprintf(b, sizeof b, "%s/arith_seq_gray_huff_twin.jpg", dir);
  encode(a, 61, 47, 1, 0, 0, 1);
  transcode_to_huffman(a, b, 1);

  /* sequential arithmetic, color 4:2:0, restart markers */
  snprintf(a, sizeof a, "%s/arith_seq_color.jpg", dir);
  snprintf(b, sizeof b, "%s/arith_seq_color_huff_twin.jpg", dir);
  encode(a, 83, 59, 0, 0, 3, 1);
  transcode_to_huffman(a, b, 1);

  /* progressive arithmetic, color (libjpeg default scan script) */
  snprintf(a, sizeof a, "%s/arith_prog_color.jpg", dir);
  snprintf(b, sizeof b, "%s/arith_prog_color_huff_twin.jpg", dir);
  encode(a, 72, 56, 0, 1, 0, 1);
  transcode_to_huffman(a, b, 1);

  printf("OK\n");
  return 0;
}
