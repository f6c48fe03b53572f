// Fast host-side data path for libfm_tpu (C ABI, loaded via ctypes).
//
// TPU-native equivalent of the reference's L1/L2 data machinery:
// the two-pass sscanf text parser (/root/reference/src/libfm/src/
// Data.h:191-285) and the binary sparse reader/writer
// (/root/reference/src/util/fmatrix.h:124-313). Re-designed rather than
// translated: the file is mmap'd and scanned with branch-light inline
// number parsing, filling caller-allocated numpy buffers directly so the
// Python layer does zero per-token work.
//
// Build: g++ -O3 -shared -fPIC (see libfm_tpu/native/build.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct MappedFile {
  const char* data;
  size_t size;
  int fd;
};

static int map_file(const char* path, MappedFile* mf) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  mf->size = (size_t)st.st_size;
  mf->fd = fd;
  if (mf->size == 0) { mf->data = nullptr; return 0; }
  void* p = mmap(nullptr, mf->size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (p == MAP_FAILED) { close(fd); return -1; }
  madvise(p, mf->size, MADV_SEQUENTIAL);
  mf->data = (const char*)p;
  return 0;
}

static void unmap_file(MappedFile* mf) {
  if (mf->data) munmap((void*)mf->data, mf->size);
  if (mf->fd >= 0) close(mf->fd);
}

// ---- inline number parsing ------------------------------------------------

static inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
  return p;
}

static inline const char* parse_double(const char* p, const char* end,
                                       double* out) {
  // fast path: [-+]?digits[.digits][eE[-+]digits]
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); p++; }
  double v = 0.0;
  while (p < end && *p >= '0' && *p <= '9') { v = v * 10.0 + (*p - '0'); p++; }
  if (p < end && *p == '.') {
    p++;
    double scale = 0.1;
    while (p < end && *p >= '0' && *p <= '9') {
      v += (*p - '0') * scale;
      scale *= 0.1;
      p++;
    }
  }
  if (p < end && (*p == 'e' || *p == 'E')) {
    p++;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) { eneg = (*p == '-'); p++; }
    int ex = 0;
    while (p < end && *p >= '0' && *p <= '9') { ex = ex * 10 + (*p - '0'); p++; }
    v *= pow(10.0, eneg ? -ex : ex);
  }
  *out = neg ? -v : v;
  return p;
}

static inline const char* parse_u32(const char* p, const char* end,
                                    uint32_t* out, int* ndigits) {
  uint64_t v = 0;
  int n = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    v = v * 10 + (*p - '0');
    p++;
    n++;
  }
  *out = (uint32_t)v;
  *ndigits = n;
  return p;
}

// ---- pass 1: count rows and entries --------------------------------------

// Returns 0 on success. A "row" is a non-empty, non-comment line.
int lfm_text_scan(const char* path, int64_t* n_rows, int64_t* n_entries) {
  MappedFile mf;
  if (map_file(path, &mf) != 0) return -1;
  const char* p = mf.data;
  const char* end = mf.data + mf.size;
  int64_t rows = 0, entries = 0;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', (size_t)(end - p));
    const char* line_end = nl ? nl : end;
    // truncate at comment
    const char* hash = (const char*)memchr(p, '#', (size_t)(line_end - p));
    if (hash) line_end = hash;
    const char* q = skip_ws(p, line_end);
    if (q < line_end) {
      rows++;
      // entries = number of ':' in the line
      const char* c = q;
      while ((c = (const char*)memchr(c, ':', (size_t)(line_end - c)))) {
        entries++;
        c++;
      }
    }
    p = nl ? nl + 1 : end;
  }
  unmap_file(&mf);
  *n_rows = rows;
  *n_entries = entries;
  return 0;
}

// ---- pass 2: fill CSR buffers --------------------------------------------

// indptr: int64[n_rows+1], cols: int32[n_entries], vals: float[n_entries],
// target: float[n_rows]. Returns max feature id + 1 (or 0), or -1 on error.
int64_t lfm_text_parse(const char* path, int64_t* indptr, int32_t* cols,
                       float* vals, float* target) {
  MappedFile mf;
  if (map_file(path, &mf) != 0) return -1;
  const char* p = mf.data;
  const char* end = mf.data + mf.size;
  int64_t row = 0, e = 0;
  int64_t max_feat = -1;
  indptr[0] = 0;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', (size_t)(end - p));
    const char* line_end = nl ? nl : end;
    const char* hash = (const char*)memchr(p, '#', (size_t)(line_end - p));
    if (hash) line_end = hash;
    const char* q = skip_ws(p, line_end);
    if (q < line_end) {
      double t;
      q = parse_double(q, line_end, &t);
      target[row] = (float)t;
      for (;;) {
        q = skip_ws(q, line_end);
        if (q >= line_end) break;
        uint32_t id;
        int ndig;
        q = parse_u32(q, line_end, &id, &ndig);
        if (q < line_end && *q == ':' && ndig == 0) {
          // ':' with no preceding digits (e.g. a line missing its
          // target, "3:1 4:2"): accepting it would fabricate a
          // feature-0 entry — fail like the python parser does
          unmap_file(&mf);
          return -2;
        }
        if (q < line_end && *q == ':') {
          q++;
          double v;
          q = parse_double(q, line_end, &v);
          cols[e] = (int32_t)id;
          vals[e] = (float)v;
          if ((int64_t)id > max_feat) max_feat = (int64_t)id;
          e++;
        } else {
          break;  // malformed token: stop the row like sscanf would
        }
      }
      row++;
      indptr[row] = e;
    }
    p = nl ? nl + 1 : end;
  }
  unmap_file(&mf);
  return max_feat + 1;
}

// ---- fast text writer -----------------------------------------------------

static inline char* write_u32(char* p, uint32_t v) {
  char tmp[10];
  int n = 0;
  do { tmp[n++] = '0' + (v % 10); v /= 10; } while (v);
  while (n) *p++ = tmp[--n];
  return p;
}

static inline char* write_u64(char* p, uint64_t v) {
  char tmp[20];
  int n = 0;
  do { tmp[n++] = '0' + (char)(v % 10); v /= 10; } while (v);
  while (n) *p++ = tmp[--n];
  return p;
}

static inline char* write_float(char* p, float f) {
  // integers (the common one-hot case) get the compact form
  if (f >= -1e15f && f <= 1e15f && f == (float)(int64_t)f) {
    int64_t i = (int64_t)f;
    if (i < 0) { *p++ = '-'; i = -i; }
    return write_u64(p, (uint64_t)i);
  }
  return p + sprintf(p, "%g", (double)f);
}

int lfm_text_write(const char* path, const int64_t* indptr,
                   const int32_t* cols, const float* vals,
                   const float* target, int64_t n_rows) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  size_t cap = 1 << 22;
  char* buf = (char*)malloc(cap);
  if (!buf) { fclose(f); return -1; }
  char* p = buf;
  for (int64_t i = 0; i < n_rows; i++) {
    // worst case ~32 bytes per entry (' ' + 10-digit id + ':' + %g) +
    // target/newline slack; flush — and grow for a single huge row —
    // BEFORE writing so the row can never overrun the buffer
    size_t need = 64 + 32 * (size_t)(indptr[i + 1] - indptr[i]);
    if ((size_t)(p - buf) + need > cap) {
      size_t used = (size_t)(p - buf);
      if (used && fwrite(buf, 1, used, f) != used) {
        free(buf); fclose(f); return -1;
      }
      p = buf;
      if (need > cap) {
        free(buf);
        cap = need * 2;
        buf = (char*)malloc(cap);
        if (!buf) { fclose(f); return -1; }
        p = buf;
      }
    }
    p = write_float(p, target[i]);
    for (int64_t j = indptr[i]; j < indptr[i + 1]; j++) {
      *p++ = ' ';
      p = write_u32(p, (uint32_t)cols[j]);
      *p++ = ':';
      p = write_float(p, vals[j]);
    }
    *p++ = '\n';
  }
  size_t used = (size_t)(p - buf);
  int ok = (!used || fwrite(buf, 1, used, f) == used);
  free(buf);
  if (fclose(f) != 0) ok = 0;  // flush failure (e.g. ENOSPC)
  return ok ? 0 : -1;
}

// ---- CSR -> CSC transpose (counting sort, parallel-friendly layout) ------

// t_indptr: int64[n_cols+1], t_rows: int32[nnz], t_vals: float[nnz]
int lfm_csr_transpose(const int64_t* indptr, const int32_t* cols,
                      const float* vals, int64_t n_rows, int64_t n_cols,
                      int64_t* t_indptr, int32_t* t_rows, float* t_vals) {
  int64_t nnz = indptr[n_rows];
  // count (validating: a column id beyond the declared n_cols — e.g. an
  // inconsistent binary header — must not write out of bounds)
  memset(t_indptr, 0, sizeof(int64_t) * (size_t)(n_cols + 1));
  for (int64_t e = 0; e < nnz; e++) {
    if ((uint32_t)cols[e] >= (uint64_t)n_cols) return -1;
    t_indptr[cols[e] + 1]++;
  }
  for (int64_t c = 0; c < n_cols; c++) t_indptr[c + 1] += t_indptr[c];
  // fill (stable in row order)
  int64_t* cursor = (int64_t*)malloc(sizeof(int64_t) * (size_t)n_cols);
  if (!cursor) return -1;
  memcpy(cursor, t_indptr, sizeof(int64_t) * (size_t)n_cols);
  for (int64_t r = 0; r < n_rows; r++) {
    for (int64_t e = indptr[r]; e < indptr[r + 1]; e++) {
      int64_t pos = cursor[cols[e]]++;
      t_rows[pos] = (int32_t)r;
      t_vals[pos] = vals[e];
    }
  }
  free(cursor);
  return 0;
}

}  // extern "C"
