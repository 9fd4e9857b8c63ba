// Native FASTQ input runtime: gzip/plain FASTQ -> device-ready batches.
//
// TPU-era replacement for the reference's kseq + zlib-ng streaming readers
// (reference: src/kseq.h, ext/zlib-ng/, src/ProcessReads.cpp:3128-3267).
// Instead of handing char buffers to per-read CPU matching, each batch is
// emitted directly in the device upload format: 2-bit packed base codes +
// an N-position bitmask + lengths, padded to a static length bucket so jit
// recompilation is rare.  A prefetch thread decompresses and packs ahead so
// host parsing overlaps device compute (the reference overlaps via N reader
// threads under reader_lock; here one producer per file + a bounded queue).
//
// Layout contract (must match kallisto_tpu/ops/pseudoalign.py
// pack_codes_host + quant/pipeline.py _pad_batch):
//   packed[i][j>>2] bits (2*(j&3), 2*(j&3)+1) = base code in {A=0,C=1,G=2,T=3}
//   positions with non-ACGT bases or j >= len read as code 0 in packed and
//   have bit j set in nmask (little-bit-order within each byte)
//   Lp = max(round_up(max_len, pad_to), min_len)

#include <zlib.h>

#ifdef __AVX2__
#include <immintrin.h>
#endif

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr size_t kChunk = 1 << 22;  // decompressed bytes per gzread
constexpr int kQueueDepth = 3;      // batches prefetched ahead

struct Batch {
  std::vector<uint8_t> packed;  // [n][Lp/4]
  std::vector<uint8_t> nmask;   // [n][Lp/8]
  std::vector<int32_t> lens;    // [n]
  std::vector<uint8_t> names;   // concatenated name bytes (optional)
  std::vector<int32_t> name_off;  // [n+1] offsets into names
  int32_t n = 0;
  int32_t Lp = 0;
};

struct Reader {
  gzFile f = nullptr;
  int batch_reads;
  int pad_to;
  int min_len;
  bool keep_names;

  std::thread th;
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::deque<std::unique_ptr<Batch>> queue;
  bool done = false;     // producer finished (EOF or error)
  bool stop = false;     // consumer asked to shut down
  std::string error;

  std::unique_ptr<Batch> current;  // batch handed to the consumer

  // producer-side parse state
  std::vector<uint8_t> buf;  // decompressed carry buffer
  size_t buf_pos = 0;
  int phase = 0;  // 0 header, 1 seq, 2 plus, 3 qual -- persists across batches

  ~Reader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_produce.notify_all();
    if (th.joinable()) th.join();
    if (f) gzclose(f);
  }
};

const uint8_t* code_table() {
  static uint8_t t[256];
  static bool init = false;
  if (!init) {
    memset(t, 4, sizeof(t));
    t[(int)'A'] = t[(int)'a'] = 0;
    t[(int)'C'] = t[(int)'c'] = 1;
    t[(int)'G'] = t[(int)'g'] = 2;
    t[(int)'T'] = t[(int)'t'] = 3;
    init = true;
  }
  return t;
}

// Parse up to batch_reads records from r->buf (refilling from gzread),
// returning a packed Batch, or nullptr at clean EOF.
std::unique_ptr<Batch> parse_batch(Reader* r) {
  std::vector<std::pair<size_t, int32_t>> seqs;  // (offset into seqbuf, len)
  std::vector<uint8_t> seqbuf;
  std::vector<uint8_t> names;
  std::vector<int32_t> name_off{0};
  seqbuf.reserve((size_t)r->batch_reads * 128);
  seqs.reserve(r->batch_reads);
  int& phase = r->phase;
  int32_t max_len = 0;

  while ((int)seqs.size() < r->batch_reads) {
    // find next newline in buf
    const uint8_t* base = r->buf.data();
    const uint8_t* nl = (const uint8_t*)memchr(
        base + r->buf_pos, '\n', r->buf.size() - r->buf_pos);
    if (nl == nullptr) {
      // refill: compact leftover, append a fresh chunk
      if (r->buf_pos > 0) {
        r->buf.erase(r->buf.begin(), r->buf.begin() + r->buf_pos);
        r->buf_pos = 0;
      }
      size_t old = r->buf.size();
      r->buf.resize(old + kChunk);
      int got = gzread(r->f, r->buf.data() + old, kChunk);
      if (got < 0) {
        int errnum = 0;
        r->error = std::string("gzread: ") + gzerror(r->f, &errnum);
        return nullptr;
      }
      r->buf.resize(old + got);
      if (got == 0) {
        // EOF: a final line without trailing newline still counts
        if (old > 0 && phase == 1) {
          size_t len = old;
          if (len > 0 && r->buf[len - 1] == '\r') len--;
          seqs.emplace_back(seqbuf.size(), (int32_t)len);
          seqbuf.insert(seqbuf.end(), r->buf.begin(), r->buf.begin() + len);
          max_len = std::max(max_len, (int32_t)len);
          r->buf.clear();
          phase = 2;
        }
        break;
      }
      continue;
    }
    size_t line_start = r->buf_pos;
    size_t line_len = nl - base - line_start;
    r->buf_pos = (nl - base) + 1;
    if (line_len > 0 && base[line_start + line_len - 1] == '\r') line_len--;

    if (phase == 0) {
      if (line_len == 0) continue;  // tolerate blank lines between records
      if (r->keep_names) {
        // strip leading '@' and cut at first space/tab
        size_t s = line_start + 1, e = line_start + line_len;
        size_t c = s;
        while (c < e && base[c] != ' ' && base[c] != '\t') c++;
        names.insert(names.end(), base + s, base + c);
        name_off.push_back((int32_t)names.size());
      }
      phase = 1;
    } else if (phase == 1) {
      seqs.emplace_back(seqbuf.size(), (int32_t)line_len);
      seqbuf.insert(seqbuf.end(), base + line_start,
                    base + line_start + line_len);
      max_len = std::max(max_len, (int32_t)line_len);
      phase = 2;
    } else if (phase == 2) {
      phase = 3;
    } else {
      phase = 0;
    }
  }

  if (seqs.empty()) return nullptr;

  auto b = std::make_unique<Batch>();
  b->n = (int32_t)seqs.size();
  int32_t Lp = std::max(max_len, (int32_t)r->min_len);
  Lp = (Lp + r->pad_to - 1) / r->pad_to * r->pad_to;
  b->Lp = Lp;
  const int32_t pb = Lp / 4, nb = Lp / 8;
  b->packed.assign((size_t)b->n * pb, 0);
  b->nmask.assign((size_t)b->n * nb, 0);
  b->lens.resize(b->n);
  const uint8_t* ct = code_table();
#ifdef __AVX2__
  // AVX2 fast path: 32 bases per iteration.  Codes come from a low-nibble
  // shuffle LUT (A->0 C->1 G->2 T->3, case-insensitive since upper/lower
  // share low nibbles); validity is an exact byte compare against the 8
  // accepted letters; 2-bit packing is two multiply-add reductions.
  const __m256i nib_lut = _mm256_setr_epi8(
      //            A     C        G                          T
      0, 0 /*A*/, 0, 1 /*C*/, 3 /*T? no: idx*/, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 1, 3, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0);
  // low nibbles: A/a=0x1 -> 0, C/c=0x3 -> 1, G/g=0x7 -> 2, T/t=0x4 -> 3
  const __m256i lower = _mm256_set1_epi8(0x20);
  const __m256i ca = _mm256_set1_epi8('a');
  const __m256i cc = _mm256_set1_epi8('c');
  const __m256i cg = _mm256_set1_epi8('g');
  const __m256i ctt = _mm256_set1_epi8('t');
  const __m256i nibmask = _mm256_set1_epi8(0x0F);
  const __m256i w14 = _mm256_set1_epi16(0x0401);   // bytes [1, 4] per pair
  const __m256i w116 = _mm256_set1_epi32(0x00100001);  // u16 [1, 16]
#endif
  for (int32_t i = 0; i < b->n; i++) {
    const uint8_t* s = seqbuf.data() + seqs[i].first;
    const int32_t len = seqs[i].second;
    b->lens[i] = len;
    uint8_t* pk = b->packed.data() + (size_t)i * pb;
    uint8_t* nm = b->nmask.data() + (size_t)i * nb;
    int32_t j = 0;
#ifdef __AVX2__
    for (; j + 32 <= len; j += 32) {
      __m256i v = _mm256_loadu_si256((const __m256i*)(s + j));
      __m256i lo = _mm256_or_si256(v, lower);
      __m256i ok = _mm256_or_si256(
          _mm256_or_si256(_mm256_cmpeq_epi8(lo, ca), _mm256_cmpeq_epi8(lo, cc)),
          _mm256_or_si256(_mm256_cmpeq_epi8(lo, cg), _mm256_cmpeq_epi8(lo, ctt)));
      __m256i code = _mm256_shuffle_epi8(nib_lut, _mm256_and_si256(v, nibmask));
      code = _mm256_and_si256(code, ok);  // invalid -> 0 in packed
      // 32 x 2-bit -> 8 bytes: (c0 + 4*c1) per byte pair, then + 16*(..)
      __m256i p16 = _mm256_maddubs_epi16(code, w14);   // 16 x u16
      __m256i p32 = _mm256_madd_epi16(p16, w116);      // 8 x u32 (one byte)
      // narrow 8 u32 -> 8 bytes
      __m128i lo128 = _mm256_castsi256_si128(p32);
      __m128i hi128 = _mm256_extracti128_si256(p32, 1);
      __m128i b16 = _mm_packus_epi32(lo128, hi128);    // 8 x u16
      __m128i b8 = _mm_packus_epi16(b16, b16);         // 8 bytes (x2)
      uint64_t packed8 = (uint64_t)_mm_cvtsi128_si64(b8);
      memcpy(pk + (j >> 2), &packed8, 8);
      uint32_t bad = ~(uint32_t)_mm256_movemask_epi8(ok);
      memcpy(nm + (j >> 3), &bad, 4);
    }
#endif
    for (; j < len; j++) {
      uint8_t c = ct[s[j]];
      if (c == 4) {
        nm[j >> 3] |= (uint8_t)(1u << (j & 7));
      } else {
        pk[j >> 2] |= (uint8_t)(c << ((j & 3) * 2));
      }
    }
    for (int32_t j2 = len; j2 < Lp; j2++)
      nm[j2 >> 3] |= (uint8_t)(1u << (j2 & 7));
  }
  if (r->keep_names) {
    b->names = std::move(names);
    b->name_off = std::move(name_off);
  }
  return b;
}

void producer_loop(Reader* r) {
  while (true) {
    auto b = parse_batch(r);
    std::unique_lock<std::mutex> lk(r->mu);
    if (b == nullptr) {
      r->done = true;
      r->cv_consume.notify_all();
      return;
    }
    r->cv_produce.wait(lk, [r] {
      return r->stop || (int)r->queue.size() < kQueueDepth;
    });
    if (r->stop) return;
    r->queue.push_back(std::move(b));
    r->cv_consume.notify_all();
  }
}

}  // namespace

extern "C" {

int ktio_abi_version() { return 3; }

void* ktio_open(const char* path, int batch_reads, int pad_to, int min_len,
                int keep_names) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return nullptr;
  gzbuffer(f, 1 << 20);
  auto* r = new Reader();
  r->f = f;
  r->batch_reads = batch_reads;
  r->pad_to = pad_to > 0 ? pad_to : 32;
  r->min_len = min_len;
  r->keep_names = keep_names != 0;
  r->th = std::thread(producer_loop, r);
  return r;
}

// Returns 1 with pointers set, 0 at EOF, -1 on error.  Pointers stay valid
// until the next ktio_next/ktio_close on the same handle.
int ktio_next(void* h, const uint8_t** packed, const uint8_t** nmask,
              const int32_t** lens, const uint8_t** names,
              const int32_t** name_off, int32_t* n, int32_t* Lp) {
  auto* r = (Reader*)h;
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_consume.wait(lk, [r] { return r->done || !r->queue.empty(); });
  if (r->queue.empty()) {
    return r->error.empty() ? 0 : -1;
  }
  r->current = std::move(r->queue.front());
  r->queue.pop_front();
  lk.unlock();
  r->cv_produce.notify_all();
  Batch* b = r->current.get();
  *packed = b->packed.data();
  *nmask = b->nmask.data();
  *lens = b->lens.data();
  *names = b->names.data();
  *name_off = b->name_off.data();
  *n = b->n;
  *Lp = b->Lp;
  return 1;
}

const char* ktio_error(void* h) { return ((Reader*)h)->error.c_str(); }

void ktio_close(void* h) { delete (Reader*)h; }

}  // extern "C"
