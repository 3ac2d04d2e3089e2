/* Minimal stdin->stdout Brotli compress/decompress CLI over the system
 * libbrotli, used ONLY by tests as an external conformance oracle for
 * graft's pure-JVM codec (cross-validation per SURVEY.md section 5.2).
 *
 * Usage: brotli_cli c <quality 0..11> <lgwin 10..24>   (compress)
 *        brotli_cli d                                  (decompress)
 *
 * Build: gcc -O2 -o brotli_cli brotli_cli.c -lbrotlienc -lbrotlidec -lbrotlicommon
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <brotli/encode.h>
#include <brotli/decode.h>

static uint8_t* read_all(FILE* f, size_t* n) {
  size_t cap = 1 << 20, len = 0;
  uint8_t* buf = malloc(cap);
  for (;;) {
    if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
    size_t r = fread(buf + len, 1, cap - len, f);
    len += r;
    if (r == 0) break;
  }
  *n = len;
  return buf;
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s c <q> <lgwin> | d\n", argv[0]); return 2; }
  size_t inLen;
  uint8_t* in = read_all(stdin, &inLen);
  if (argv[1][0] == 'c') {
    int q = argc > 2 ? atoi(argv[2]) : 6;
    int w = argc > 3 ? atoi(argv[3]) : 22;
    size_t outCap = BrotliEncoderMaxCompressedSize(inLen);
    if (outCap < 1024) outCap = 1024;
    uint8_t* out = malloc(outCap);
    size_t outLen = outCap;
    if (!BrotliEncoderCompress(q, w, BROTLI_MODE_GENERIC, inLen, in, &outLen, out)) {
      fprintf(stderr, "compress failed\n");
      return 1;
    }
    fwrite(out, 1, outLen, stdout);
  } else {
    BrotliDecoderState* s = BrotliDecoderCreateInstance(NULL, NULL, NULL);
    const uint8_t* next_in = in;
    size_t avail_in = inLen;
    uint8_t buf[1 << 16];
    for (;;) {
      uint8_t* next_out = buf;
      size_t avail_out = sizeof buf;
      BrotliDecoderResult r =
          BrotliDecoderDecompressStream(s, &avail_in, &next_in, &avail_out, &next_out, NULL);
      fwrite(buf, 1, sizeof buf - avail_out, stdout);
      if (r == BROTLI_DECODER_RESULT_SUCCESS) break;
      if (r == BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT) continue;
      fprintf(stderr, "decompress failed (result %d)\n", (int)r);
      return 1;
    }
    BrotliDecoderDestroyInstance(s);
  }
  return 0;
}
