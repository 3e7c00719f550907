// Host-side streaming FASTA/FASTQ parser + 2-bit base encoder.
//
// The native replacement for the reference's stage-1 Biopython iteration and
// fastq rewriting (bear_model/summarize.py:96-286): one buffered pass over
// the input, emitting concatenated int8 base codes and per-sequence offsets
// with no intermediate files.  Exposed via a minimal C ABI consumed with
// ctypes (bear_tpu/counting/_native_build.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o _fastx.so _fastx.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Parsed {
  std::vector<int8_t> codes;     // concatenated 2-bit base codes
  std::vector<int64_t> offsets;  // n_seqs + 1 prefix offsets into codes
};

// ASCII -> 2-bit code; anything outside ACGTacgt maps to 0 (A), matching the
// Python fallback and the reference's documented non-handling of N.
int8_t kEncode[256];

struct EncodeInit {
  EncodeInit() {
    memset(kEncode, 0, sizeof(kEncode));
    kEncode[(unsigned char)'A'] = 0; kEncode[(unsigned char)'a'] = 0;
    kEncode[(unsigned char)'C'] = 1; kEncode[(unsigned char)'c'] = 1;
    kEncode[(unsigned char)'G'] = 2; kEncode[(unsigned char)'g'] = 2;
    kEncode[(unsigned char)'T'] = 3; kEncode[(unsigned char)'t'] = 3;
  }
} encode_init;

void append_encoded(Parsed* out, const char* s, size_t n) {
  size_t base = out->codes.size();
  out->codes.resize(base + n);
  for (size_t i = 0; i < n; ++i) {
    out->codes[base + i] = kEncode[(unsigned char)s[i]];
  }
}

bool read_line(FILE* f, std::string& line) {
  line.clear();
  char buf[1 << 16];
  while (fgets(buf, sizeof(buf), f)) {
    size_t n = strlen(buf);
    bool eol = n > 0 && buf[n - 1] == '\n';
    if (eol) --n;
    if (n > 0 && buf[n - 1] == '\r') --n;
    line.append(buf, n);
    if (eol) return true;
  }
  return !line.empty();
}

Parsed* parse_fasta(FILE* f) {
  auto* out = new Parsed();
  out->offsets.push_back(0);
  std::string line;
  bool in_seq = false;
  while (read_line(f, line)) {
    if (line.empty()) continue;
    if (line[0] == '>') {
      if (in_seq) out->offsets.push_back((int64_t)out->codes.size());
      in_seq = true;
    } else if (in_seq) {
      append_encoded(out, line.data(), line.size());
    }
  }
  if (in_seq) out->offsets.push_back((int64_t)out->codes.size());
  return out;
}

Parsed* parse_fastq(FILE* f) {
  auto* out = new Parsed();
  out->offsets.push_back(0);
  std::string header, seq, plus, qual;
  while (read_line(f, header)) {
    if (header.empty()) continue;
    if (!read_line(f, seq)) break;
    read_line(f, plus);
    read_line(f, qual);
    append_encoded(out, seq.data(), seq.size());
    out->offsets.push_back((int64_t)out->codes.size());
  }
  return out;
}

}  // namespace

extern "C" {

// Parse a file. type: 0 = fasta, 1 = fastq. Returns an opaque handle
// (nullptr on failure to open).
void* bear_fastx_parse(const char* path, int type) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  Parsed* out = type == 1 ? parse_fastq(f) : parse_fasta(f);
  fclose(f);
  return out;
}

int64_t bear_fastx_num_seqs(void* handle) {
  return (int64_t)((Parsed*)handle)->offsets.size() - 1;
}

int64_t bear_fastx_total_bases(void* handle) {
  return (int64_t)((Parsed*)handle)->codes.size();
}

const int8_t* bear_fastx_codes(void* handle) {
  return ((Parsed*)handle)->codes.data();
}

const int64_t* bear_fastx_offsets(void* handle) {
  return ((Parsed*)handle)->offsets.data();
}

void bear_fastx_free(void* handle) { delete (Parsed*)handle; }

}  // extern "C"
