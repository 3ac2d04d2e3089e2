/* Extracts RFC 7932 specification data (static dictionary Appendix A,
 * transforms Appendix B, context lookup tables section 7.1) from the
 * system libbrotlicommon shared library into flat resource files the
 * Scala decoder embeds. The extracted bytes ARE the RFC's published
 * data; the library is only a convenient machine-readable carrier.
 *
 * Usage: dump_brotli_tables <outdir>
 * Writes: dictionary.bin, transforms.bin, context.bin
 *
 * Build: gcc -O2 -o dump_brotli_tables dump_brotli_tables.c -ldl
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <dlfcn.h>

/* struct layouts from public brotli 1.0.9 headers (BSD-licensed,
 * common/dictionary.h and common/transform.h) */
typedef struct BrotliDictionary {
  uint8_t size_bits_by_length[32];
  uint32_t offsets_by_length[32];
  size_t data_size;
  const uint8_t* data;
} BrotliDictionary;

typedef struct BrotliTransforms {
  uint16_t prefix_suffix_size;
  const uint8_t* prefix_suffix;
  const uint16_t* prefix_suffix_map;
  uint32_t num_transforms;
  const uint8_t* transforms; /* triples: prefix_id, type, suffix_id */
  const uint8_t* params;
  int16_t cutOffTransforms[10];
} BrotliTransforms;

static void wr_u16(FILE* f, uint16_t v) { fputc(v & 0xff, f); fputc(v >> 8, f); }
static void wr_u32(FILE* f, uint32_t v) { int i; for (i = 0; i < 4; i++) fputc((v >> (8 * i)) & 0xff, f); }

int main(int argc, char** argv) {
  if (argc != 2) { fprintf(stderr, "usage: %s <outdir>\n", argv[0]); return 2; }
  void* lib = dlopen("libbrotlicommon.so.1", RTLD_NOW);
  if (!lib) { fprintf(stderr, "dlopen: %s\n", dlerror()); return 1; }
  const BrotliDictionary* (*getDict)(void) =
      (const BrotliDictionary* (*)(void))dlsym(lib, "BrotliGetDictionary");
  const BrotliTransforms* (*getTrans)(void) =
      (const BrotliTransforms* (*)(void))dlsym(lib, "BrotliGetTransforms");
  const uint8_t* ctxLut = (const uint8_t*)dlsym(lib, "_kBrotliContextLookupTable");
  if (!getDict || !getTrans || !ctxLut) { fprintf(stderr, "missing symbol\n"); return 1; }

  char path[4096];
  const BrotliDictionary* d = getDict();
  fprintf(stderr, "dictionary: data_size=%zu\n", d->data_size);
  if (d->data_size != 122784) { fprintf(stderr, "unexpected dict size\n"); return 1; }
  snprintf(path, sizeof path, "%s/dictionary.bin", argv[1]);
  FILE* f = fopen(path, "wb");
  fwrite(d->size_bits_by_length, 1, 32, f);
  { int i; for (i = 0; i < 32; i++) wr_u32(f, d->offsets_by_length[i]); }
  wr_u32(f, (uint32_t)d->data_size);
  fwrite(d->data, 1, d->data_size, f);
  fclose(f);

  const BrotliTransforms* t = getTrans();
  fprintf(stderr, "transforms: n=%u prefix_suffix_size=%u\n",
          t->num_transforms, t->prefix_suffix_size);
  if (t->num_transforms != 121) { fprintf(stderr, "unexpected transform count\n"); return 1; }
  /* find max prefix/suffix id used, dump that much of the map */
  uint32_t i, maxId = 0;
  for (i = 0; i < t->num_transforms * 3; i += 3) {
    if (t->transforms[i] > maxId) maxId = t->transforms[i];
    if (t->transforms[i + 2] > maxId) maxId = t->transforms[i + 2];
  }
  snprintf(path, sizeof path, "%s/transforms.bin", argv[1]);
  f = fopen(path, "wb");
  wr_u16(f, t->prefix_suffix_size);
  fwrite(t->prefix_suffix, 1, t->prefix_suffix_size, f);
  wr_u16(f, (uint16_t)(maxId + 1));
  for (i = 0; i <= maxId; i++) wr_u16(f, t->prefix_suffix_map[i]);
  wr_u32(f, t->num_transforms);
  fwrite(t->transforms, 1, t->num_transforms * 3, f);
  fclose(f);

  snprintf(path, sizeof path, "%s/context.bin", argv[1]);
  f = fopen(path, "wb");
  fwrite(ctxLut, 1, 2048, f); /* 4 modes x (256 p1-lut + 256 p2-lut) */
  fclose(f);
  fprintf(stderr, "ok\n");
  return 0;
}
