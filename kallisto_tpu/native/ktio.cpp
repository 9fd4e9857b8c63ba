// Native FASTQ input runtime: gzip/plain FASTQ -> device-ready batches.
//
// TPU-era replacement for the reference's kseq + zlib-ng streaming readers
// (reference: src/kseq.h, ext/zlib-ng/, src/ProcessReads.cpp:3128-3267).
// Instead of handing char buffers to per-read CPU matching, each batch is
// emitted directly in the device upload format: 2-bit packed base codes +
// an N-position bitmask + lengths, padded to a static length bucket so jit
// recompilation is rare.
//
// Decode pipeline (one per open file):
//   source stage -> chunk queue -> parse/pack thread -> batch queue -> consumer
// The source stage is the throughput lever:
//   * BGZF files (bgzip/htslib framing: gzip members with the BC extra
//     subfield carrying the compressed block size) decode BLOCK-PARALLEL:
//     an IO thread walks the block headers (no inflation) and a pool of
//     inflate workers decompresses blocks concurrently, reassembled in
//     order.  Single-stream zlib tops out ~170 MB/s; N workers scale it.
//   * plain gzip decodes on one dedicated thread (zlib is inherently
//     serial there), still overlapped with parsing and packing.
// The parse/pack thread (line split + AVX2 2-bit packing) sustains >4M
// reads/s and is never the bottleneck.
//
// Layout contract (must match kallisto_tpu/ops/pseudoalign.py
// pack_codes_host + quant/pipeline.py _pad_batch):
//   packed[i][j>>2] bits (2*(j&3), 2*(j&3)+1) = base code in {A=0,C=1,G=2,T=3}
//   positions with non-ACGT bases or j >= len read as code 0 in packed and
//   have bit j set in nmask (little-bit-order within each byte)
//   Lp = max(round_up(max_len, pad_to), min_len)

#include <zlib.h>

#if defined(__has_include)
#if __has_include(<libdeflate.h>)
#include <libdeflate.h>
#define KTIO_HAVE_LIBDEFLATE 1
#endif
#endif

#ifdef __AVX2__
#include <immintrin.h>
#endif

#include <algorithm>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr size_t kChunk = 1 << 22;   // decompressed bytes per plain-gzip read
constexpr int kQueueDepth = 3;       // packed batches prefetched ahead
constexpr int kChunkQueueDepth = 64; // decompressed chunks buffered ahead
constexpr int kJobQueueDepth = 128;  // compressed BGZF blocks in flight

struct Batch {
  std::vector<uint8_t> packed;  // [n][Lp/4]
  std::vector<uint8_t> nmask;   // [n][Lp/8]
  std::vector<int32_t> lens;    // [n]
  std::vector<uint8_t> names;   // concatenated name bytes (optional)
  std::vector<int32_t> name_off;  // [n+1] offsets into names
  int32_t n = 0;
  int32_t Lp = 0;
};

// ---------------------------------------------------------------------------
// Ordered chunk queue: decompressed byte chunks flowing to the parser.

struct ChunkQueue {
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::deque<std::vector<uint8_t>> q;
  bool done = false;
  bool stop = false;
  std::string error;

  void put(std::vector<uint8_t>&& c) {
    std::unique_lock<std::mutex> lk(mu);
    cv_put.wait(lk, [this] { return stop || (int)q.size() < kChunkQueueDepth; });
    if (stop) return;
    q.push_back(std::move(c));
    cv_get.notify_one();
  }
  // false = clean end of stream (or error; check error string)
  bool get(std::vector<uint8_t>& out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_get.wait(lk, [this] { return done || stop || !q.empty(); });
    if (q.empty()) return false;
    out = std::move(q.front());
    q.pop_front();
    cv_put.notify_one();
    return true;
  }
  void finish(const std::string& err = "") {
    std::lock_guard<std::mutex> lk(mu);
    if (!err.empty() && error.empty()) error = err;
    done = true;
    cv_get.notify_all();
  }
  void shutdown() {
    std::lock_guard<std::mutex> lk(mu);
    stop = true;
    cv_put.notify_all();
    cv_get.notify_all();
  }
};

// ---------------------------------------------------------------------------
// BGZF block-parallel source.

struct BgzfJob {
  uint64_t seq = 0;
  std::vector<uint8_t> comp;   // raw deflate payload
  uint32_t isize = 0;          // uncompressed size from the gzip trailer
};

struct BgzfSource {
  FILE* f = nullptr;
  int n_workers = 2;
  ChunkQueue* out = nullptr;

  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::deque<std::unique_ptr<BgzfJob>> jobs;
  bool io_done = false;
  bool stop = false;
  std::string error;

  // reorder buffer: seq -> inflated chunk
  std::mutex rmu;
  std::condition_variable rcv;
  std::map<uint64_t, std::vector<uint8_t>> ready;
  uint64_t next_emit = 0;
  int live_workers = 0;

  std::thread io_th;
  std::vector<std::thread> workers;
  std::thread emit_th;

  ~BgzfSource() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_put.notify_all();
    cv_get.notify_all();
    {
      std::lock_guard<std::mutex> lk(rmu);
      rcv.notify_all();
    }
    if (io_th.joinable()) io_th.join();
    for (auto& w : workers)
      if (w.joinable()) w.join();
    if (emit_th.joinable()) emit_th.join();
    if (f) fclose(f);
  }
};

// Parse one BGZF block header at the current file position; returns the
// total block size (0 at EOF, -1 on format error) and the extra length.
static int read_bgzf_header(FILE* f, uint8_t hdr[18], int* xlen_out,
                            int* bsize_out) {
  size_t got = fread(hdr, 1, 12, f);
  if (got == 0) return 0;
  if (got != 12 || hdr[0] != 0x1f || hdr[1] != 0x8b || hdr[2] != 8 ||
      !(hdr[3] & 4))
    return -1;
  int xlen = hdr[10] | (hdr[11] << 8);
  // scan the extra field for the BC subfield
  int bsize = -1;
  std::vector<uint8_t> extra(xlen);
  if ((int)fread(extra.data(), 1, xlen, f) != xlen) return -1;
  for (int i = 0; i + 4 <= xlen;) {
    int slen = extra[i + 2] | (extra[i + 3] << 8);
    if (extra[i] == 'B' && extra[i + 1] == 'C' && slen == 2)
      bsize = (extra[i + 4] | (extra[i + 5] << 8)) + 1;
    i += 4 + slen;
  }
  *xlen_out = xlen;
  *bsize_out = bsize;
  return bsize > 0 ? bsize : -1;
}

static void bgzf_io_loop(BgzfSource* s) {
  uint64_t seq = 0;
  std::string err;
  while (true) {
    uint8_t hdr[18];
    int xlen = 0, bsize = 0;
    int rc = read_bgzf_header(s->f, hdr, &xlen, &bsize);
    if (rc == 0) break;
    if (rc < 0) {
      err = "bgzf: malformed block header";
      break;
    }
    int payload = bsize - 12 - xlen - 8;
    if (payload < 0) {
      err = "bgzf: bad BSIZE";
      break;
    }
    auto job = std::make_unique<BgzfJob>();
    job->seq = seq++;
    job->comp.resize(payload);
    uint8_t trailer[8];
    if ((int)fread(job->comp.data(), 1, payload, s->f) != payload ||
        fread(trailer, 1, 8, s->f) != 8) {
      err = "bgzf: truncated block";
      break;
    }
    job->isize = (uint32_t)trailer[4] | ((uint32_t)trailer[5] << 8) |
                 ((uint32_t)trailer[6] << 16) | ((uint32_t)trailer[7] << 24);
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv_put.wait(lk, [s] {
      return s->stop || (int)s->jobs.size() < kJobQueueDepth;
    });
    if (s->stop) return;
    s->jobs.push_back(std::move(job));
    s->cv_get.notify_one();
  }
  std::lock_guard<std::mutex> lk(s->mu);
  s->io_done = true;
  if (!err.empty()) s->error = err;
  s->cv_get.notify_all();
}

static void bgzf_worker_loop(BgzfSource* s) {
#ifdef KTIO_HAVE_LIBDEFLATE
  // libdeflate's whole-buffer inflate is 2-3x faster than zlib's
  // streaming path -- BGZF blocks are complete deflate streams, so the
  // whole-buffer API applies directly (one decompressor per worker)
  struct libdeflate_decompressor* ld = libdeflate_alloc_decompressor();
#endif
  while (true) {
    std::unique_ptr<BgzfJob> job;
    {
      std::unique_lock<std::mutex> lk(s->mu);
      s->cv_get.wait(lk, [s] {
        return s->stop || s->io_done || !s->jobs.empty();
      });
      if (s->stop) break;
      if (s->jobs.empty()) break;  // io done and drained
      job = std::move(s->jobs.front());
      s->jobs.pop_front();
      s->cv_put.notify_one();
    }
    if (!job) break;
    std::vector<uint8_t> outbuf(job->isize);
    if (job->isize > 0) {
      bool ok;
#ifdef KTIO_HAVE_LIBDEFLATE
      ok = libdeflate_deflate_decompress(
               ld, job->comp.data(), job->comp.size(), outbuf.data(),
               outbuf.size(), nullptr) == LIBDEFLATE_SUCCESS;
#else
      z_stream zs;
      memset(&zs, 0, sizeof(zs));
      inflateInit2(&zs, -15);
      zs.next_in = job->comp.data();
      zs.avail_in = (uInt)job->comp.size();
      zs.next_out = outbuf.data();
      zs.avail_out = (uInt)outbuf.size();
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      ok = rc == Z_STREAM_END;
#endif
      if (!ok) {
        std::lock_guard<std::mutex> lk(s->mu);
        if (s->error.empty()) s->error = "bgzf: inflate failed";
        outbuf.clear();
      }
    }
    std::lock_guard<std::mutex> lk(s->rmu);
    s->ready.emplace(job->seq, std::move(outbuf));
    s->rcv.notify_all();
  }
#ifdef KTIO_HAVE_LIBDEFLATE
  libdeflate_free_decompressor(ld);
#endif
  if (true) {
    std::lock_guard<std::mutex> lk(s->rmu);
    s->live_workers--;
    s->rcv.notify_all();
  }
}

static void bgzf_emit_loop(BgzfSource* s) {
  while (true) {
    std::vector<uint8_t> chunk;
    {
      std::unique_lock<std::mutex> lk(s->rmu);
      s->rcv.wait(lk, [s] {
        return s->stop || s->ready.count(s->next_emit) ||
               (s->live_workers == 0 && s->ready.empty());
      });
      if (s->stop) return;
      auto it = s->ready.find(s->next_emit);
      if (it == s->ready.end()) break;  // all workers done, nothing left
      chunk = std::move(it->second);
      s->ready.erase(it);
      s->next_emit++;
    }
    if (!chunk.empty()) s->out->put(std::move(chunk));
  }
  std::string err;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    err = s->error;
  }
  s->out->finish(err);
}

// ---------------------------------------------------------------------------
// Plain-gzip (or uncompressed) serial source.

struct GzSource {
  gzFile f = nullptr;
  ChunkQueue* out = nullptr;
  std::thread th;
  bool stop = false;

  ~GzSource() {
    stop = true;
    out->shutdown();
    if (th.joinable()) th.join();
    if (f) gzclose(f);
  }
};

static void gz_loop(GzSource* s) {
  while (!s->stop) {
    std::vector<uint8_t> chunk(kChunk);
    int got = gzread(s->f, chunk.data(), kChunk);
    if (got < 0) {
      int errnum = 0;
      s->out->finish(std::string("gzread: ") + gzerror(s->f, &errnum));
      return;
    }
    if (got == 0) {
      s->out->finish();
      return;
    }
    chunk.resize(got);
    s->out->put(std::move(chunk));
  }
}

// ---------------------------------------------------------------------------
// Reader: chunk queue -> parse/pack thread -> batch queue.

struct Reader {
  int batch_reads;
  int pad_to;
  int min_len;
  bool keep_names;

  ChunkQueue chunks;
  std::unique_ptr<BgzfSource> bgzf;
  std::unique_ptr<GzSource> gz;

  std::thread th;
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::deque<std::unique_ptr<Batch>> queue;
  bool done = false;
  bool stop = false;
  std::string error;

  std::unique_ptr<Batch> current;

  // parse state
  std::vector<uint8_t> buf;
  size_t buf_pos = 0;
  int phase = 0;  // 0 header, 1 seq, 2 plus, 3 qual
  bool src_eof = false;

  ~Reader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    chunks.shutdown();
    cv_produce.notify_all();
    if (th.joinable()) th.join();
    bgzf.reset();
    gz.reset();
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

// Refill r->buf from the chunk queue; returns false at end of stream.
static bool refill(Reader* r) {
  if (r->src_eof) return false;
  if (r->buf_pos > 0) {
    r->buf.erase(r->buf.begin(), r->buf.begin() + r->buf_pos);
    r->buf_pos = 0;
  }
  std::vector<uint8_t> chunk;
  if (!r->chunks.get(chunk)) {
    r->src_eof = true;
    if (!r->chunks.error.empty()) r->error = r->chunks.error;
    return false;
  }
  r->buf.insert(r->buf.end(), chunk.begin(), chunk.end());
  return true;
}

// Parse up to batch_reads records from the chunk stream, packing into a
// Batch; nullptr at clean EOF.
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
    const uint8_t* base = r->buf.data();
    const uint8_t* nl = (const uint8_t*)memchr(
        base + r->buf_pos, '\n', r->buf.size() - r->buf_pos);
    if (nl == nullptr) {
      if (!refill(r)) {
        // EOF: a final line without trailing newline still counts
        size_t old = r->buf.size() - r->buf_pos;
        if (old > 0 && phase == 1) {
          const uint8_t* s0 = r->buf.data() + r->buf_pos;
          size_t len = old;
          if (len > 0 && s0[len - 1] == '\r') len--;
          seqs.emplace_back(seqbuf.size(), (int32_t)len);
          seqbuf.insert(seqbuf.end(), s0, s0 + len);
          max_len = std::max(max_len, (int32_t)len);
          phase = 2;
        }
        r->buf.clear();
        r->buf_pos = 0;
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
      0, 0 /*A*/, 0, 1 /*C*/, 3, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 1, 3, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0);
  const __m256i lower = _mm256_set1_epi8(0x20);
  const __m256i ca = _mm256_set1_epi8('a');
  const __m256i cc = _mm256_set1_epi8('c');
  const __m256i cg = _mm256_set1_epi8('g');
  const __m256i ctt = _mm256_set1_epi8('t');
  const __m256i nibmask = _mm256_set1_epi8(0x0F);
  const __m256i w14 = _mm256_set1_epi16(0x0401);
  const __m256i w116 = _mm256_set1_epi32(0x00100001);
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
      code = _mm256_and_si256(code, ok);
      __m256i p16 = _mm256_maddubs_epi16(code, w14);
      __m256i p32 = _mm256_madd_epi16(p16, w116);
      __m128i lo128 = _mm256_castsi256_si128(p32);
      __m128i hi128 = _mm256_extracti128_si256(p32, 1);
      __m128i b16 = _mm_packus_epi32(lo128, hi128);
      __m128i b8 = _mm_packus_epi16(b16, b16);
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

// Sniff the file header: BGZF iff gzip + FEXTRA + BC subfield.
static bool is_bgzf(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t hdr[18];
  int xlen = 0, bsize = 0;
  int rc = read_bgzf_header(f, hdr, &xlen, &bsize);
  fclose(f);
  return rc > 0;
}

}  // namespace

extern "C" {

int ktio_abi_version() { return 8; }

void* ktio_open(const char* path, int batch_reads, int pad_to, int min_len,
                int keep_names, int n_threads) {
  auto* r = new Reader();
  r->batch_reads = batch_reads;
  r->pad_to = pad_to > 0 ? pad_to : 32;
  r->min_len = min_len;
  r->keep_names = keep_names != 0;

  if (n_threads > 1 && is_bgzf(path)) {
    auto s = std::make_unique<BgzfSource>();
    s->f = fopen(path, "rb");
    if (!s->f) {
      delete r;
      return nullptr;
    }
    setvbuf(s->f, nullptr, _IOFBF, 1 << 20);
    s->n_workers = std::max(1, n_threads - 1);
    s->out = &r->chunks;
    s->live_workers = s->n_workers;
    s->io_th = std::thread(bgzf_io_loop, s.get());
    for (int i = 0; i < s->n_workers; i++)
      s->workers.emplace_back(bgzf_worker_loop, s.get());
    s->emit_th = std::thread(bgzf_emit_loop, s.get());
    r->bgzf = std::move(s);
  } else {
    auto s = std::make_unique<GzSource>();
    s->f = gzopen(path, "rb");
    if (!s->f) {
      delete r;
      return nullptr;
    }
    gzbuffer(s->f, 1 << 20);
    s->out = &r->chunks;
    s->th = std::thread(gz_loop, s.get());
    r->gz = std::move(s);
  }
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

// ---------------------------------------------------------------------------
// Host-side hashed k-mer membership for the index builder: splitmix64 mix
// -> direct-address bucket -> branch-light binary search, multithreaded.
// (numpy's searchsorted/gather loops top out ~2M lookups/s on 1e8-key
// tables; this runs ~100M/s/thread.)

static inline uint64_t mix64(uint64_t x) {
  x ^= x >> 30;
  x *= 0xBF58476D1CE4E5B9ULL;
  x ^= x >> 27;
  x *= 0x94D049BB133111EBULL;
  x ^= x >> 31;
  return x;
}

// keys_mixed: sorted mixed keys [n]; bucket_start: [2^p + 1] offsets.
// q: raw queries [m]; out_idx: position in keys_mixed (or n if miss);
// out_hit: 1/0.
void ktio_u64_lookup(const uint64_t* keys_mixed, int64_t n,
                     const int64_t* bucket_start, int p, const uint64_t* q,
                     int64_t m, int64_t* out_idx, uint8_t* out_hit,
                     int n_threads) {
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      uint64_t mq = mix64(q[i]);
      uint64_t b = p ? (mq >> (64 - p)) : 0;
      int64_t s = bucket_start[b], e = bucket_start[b + 1];
      while (s < e) {
        int64_t mid = (s + e) >> 1;
        if (keys_mixed[mid] < mq)
          s = mid + 1;
        else
          e = mid;
      }
      bool hit = s < bucket_start[b + 1] && keys_mixed[s] == mq;
      out_idx[i] = hit ? s : n;
      out_hit[i] = hit ? 1 : 0;
    }
  };
  int T = n_threads > 0 ? n_threads : 1;
  if (T == 1 || m < (1 << 16)) {
    work(0, m);
    return;
  }
  std::vector<std::thread> ths;
  int64_t per = (m + T - 1) / T;
  for (int t = 0; t < T; t++) {
    int64_t lo = t * per, hi = std::min<int64_t>(m, lo + per);
    if (lo < hi) ths.emplace_back(work, lo, hi);
  }
  for (auto& th : ths) th.join();
}

static inline uint64_t revcomp_u64(uint64_t x, int k) {
  x = ~x;
  x = ((x & 0x3333333333333333ULL) << 2) | ((x >> 2) & 0x3333333333333333ULL);
  x = ((x & 0x0F0F0F0F0F0F0F0FULL) << 4) | ((x >> 4) & 0x0F0F0F0F0F0F0F0FULL);
  x = ((x & 0x00FF00FF00FF00FFULL) << 8) | ((x >> 8) & 0x00FF00FF00FF00FFULL);
  x = ((x & 0x0000FFFF0000FFFFULL) << 16) |
      ((x >> 16) & 0x0000FFFF0000FFFFULL);
  x = (x << 32) | (x >> 32);
  return x >> (64 - 2 * k);
}

// Rolling canonical k-mers over a base-code vector (0..3, 4=N), threaded.
// Writes n-k+1 windows: canon (min of fwd/rc), is_fw, valid (no N inside).
void ktio_kmer_scan(const uint8_t* codes, int64_t n, int k, uint64_t* canon,
                    uint8_t* is_fw, uint8_t* valid, int n_threads) {
  int64_t W = n - k + 1;
  if (W <= 0) return;
  const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
  auto work = [&](int64_t lo, int64_t hi) {
    // rolling state seeded at window lo
    uint64_t fwd = 0, rc = 0;
    int64_t next_valid = lo;  // first window index with no N in it
    for (int64_t j = lo; j < lo + k - 1 && j < n; j++) {
      uint8_t c = codes[j];
      if (c >= 4) next_valid = j + 1;
      c &= 3;
      fwd = ((fwd << 2) | c) & mask;
      rc = (rc >> 2) | ((uint64_t)(3 - c) << (2 * (k - 1)));
    }
    for (int64_t w = lo; w < hi; w++) {
      uint8_t c = codes[w + k - 1];
      if (c >= 4) next_valid = w + k;
      c &= 3;
      fwd = ((fwd << 2) | c) & mask;
      rc = (rc >> 2) | ((uint64_t)(3 - c) << (2 * (k - 1)));
      bool fw = fwd <= rc;
      canon[w] = fw ? fwd : rc;
      is_fw[w] = fw ? 1 : 0;
      valid[w] = (w >= next_valid) ? 1 : 0;
    }
  };
  int T = n_threads > 0 ? n_threads : 1;
  if (T == 1 || W < (1 << 16)) {
    work(0, W);
    return;
  }
  std::vector<std::thread> ths;
  int64_t per = (W + T - 1) / T;
  for (int t = 0; t < T; t++) {
    int64_t lo = t * per, hi = std::min<int64_t>(W, lo + per);
    if (lo < hi) ths.emplace_back(work, lo, hi);
  }
  for (auto& th : ths) th.join();
}

void ktio_revcomp(const uint64_t* x, int64_t n, int k, uint64_t* out,
                  int n_threads) {
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) out[i] = revcomp_u64(x[i], k);
  };
  int T = n_threads > 0 ? n_threads : 1;
  if (T == 1 || n < (1 << 18)) {
    work(0, n);
    return;
  }
  std::vector<std::thread> ths;
  int64_t per = (n + T - 1) / T;
  for (int t = 0; t < T; t++) {
    int64_t lo = t * per, hi = std::min<int64_t>(n, lo + per);
    if (lo < hi) ths.emplace_back(work, lo, hi);
  }
  for (auto& th : ths) th.join();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Host-side wave-1 anchor probing.
//
// The TPU pseudoalignment hot path is host->device LINK bound under a
// tunneled chip (~45 MB/s): uploading every packed read costs ~28 B/pair.
// This routine runs the anchor wave of the two-wave kernel
// (kallisto_tpu/ops/anchor.py _anchor_side -- itself the data-parallel
// form of the reference's jump/skip heuristic, reference:
// src/KmerIndex.cpp:1776-1887) on the HOST against the same probe tables:
// a few k-mer lookups per mate either PROVE the whole read matches one
// unitig stretch (the anchors overlap pairwise, so their window
// equalities chain into read == unitig segment, making every intermediate
// window's hit position interpolatable) or fail it to wave 2.  Verified
// pairs collapse into a per-batch compact-key histogram built right here
// (open-addressing map over a 128-bit content hash of the exemplar
// columns, the same key layout quant/ecmap.py resolves); only the
// FAILING reads' packed codes ever cross the link, cutting upload bytes
// by the verification rate (~60-95% on real data).
//
// Key-space note: these host keys use their own hash constants, so they
// never alias the device-computed wave-2 keys; both resolve through the
// shared EC cache by content, and EC numbering stays in global read
// order because the pipeline merges host+device keys by first-occurrence
// index before resolution.

namespace {

struct W1Key {
  uint64_t h1, h2;
  int64_t first;
  int64_t count;
  int32_t ex_off;
};

struct W1Map {
  std::vector<W1Key> slots;  // h1==0 && h2==0 marks empty
  std::vector<int32_t> arena;
  size_t n = 0, cap = 0, mask = 0;

  void init(size_t c) {
    cap = c;
    mask = c - 1;
    n = 0;
    slots.assign(c, W1Key{0, 0, 0, 0, 0});
  }
  void grow() {
    std::vector<W1Key> old = std::move(slots);
    init(cap * 2);
    for (auto& s : old)
      if (s.h1 | s.h2) place(s);
  }
  void place(const W1Key& k) {
    size_t i = (size_t)k.h1 & mask;
    while (slots[i].h1 | slots[i].h2) i = (i + 1) & mask;
    slots[i] = k;
    n++;
  }
  // insert-or-update; ex points at the exemplar ints (copied on first see)
  void add(uint64_t h1, uint64_t h2, int64_t idx, const int32_t* ex, int W) {
    if ((n + 1) * 4 >= cap * 3) grow();
    size_t i = (size_t)h1 & mask;
    while (true) {
      W1Key& s = slots[i];
      if (!(s.h1 | s.h2)) {
        s.h1 = h1;
        s.h2 = h2;
        s.first = idx;
        s.count = 1;
        s.ex_off = (int32_t)(arena.size() / W);
        arena.insert(arena.end(), ex, ex + W);
        n++;
        return;
      }
      if (s.h1 == h1 && s.h2 == h2) {
        s.count++;
        if (idx < s.first) s.first = idx;
        return;
      }
      i = (i + 1) & mask;
    }
  }
};

struct W1Result {
  int32_t width = 0;
  std::vector<uint64_t> h1, h2;
  std::vector<int64_t> first, count;
  std::vector<int32_t> ex;
};

// one mate's anchor evaluation result
struct MateEval {
  bool ok;
  int nrows;
  int32_t rows[16];
  int32_t uid0, blk0, upos0;
  int32_t blo, bhi;
  uint8_t strand0;
};

struct W1Ctx {
  const uint64_t* mk;
  int64_t n_keys;
  const int64_t* bucket_start;
  int32_t p;
  const int32_t* kuid;
  const int32_t* kpos;
  const uint8_t* kfw;
  const int32_t* kblock;
  const int32_t* block_ec;
  int64_t n_blocks;
  const int32_t* pf_ptr;
  const int32_t* pf_base;
  int64_t pf_np;
  int32_t Lp, rl, k, R, n_anchors, min_range, tail_mode, pos_fl;
  std::vector<int32_t> ws;  // anchor window starts
};

// little-endian 2-bit window [w, w+k) from a packed row: code of position
// w+i lands at bits 2i (low-order-first).
static inline uint64_t load_window2(const uint8_t* row, int rowb, int w,
                                    int k) {
  int bit = 2 * w;
  int byte = bit >> 3, sh = bit & 7;
  uint8_t tmp[16] = {0};
  int take = rowb - byte;
  if (take > 16) take = 16;
  if (take > 0) memcpy(tmp, row + byte, take);
  uint64_t lo, hi;
  memcpy(&lo, tmp, 8);
  memcpy(&hi, tmp + 8, 8);
  uint64_t x = sh ? ((lo >> sh) | (hi << (64 - sh))) : lo;
  uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
  return x & mask;
}

static inline bool window_has_bit(const uint8_t* nm, int nmb, int w, int k) {
  int byte = w >> 3, sh = w & 7;
  uint8_t tmp[16] = {0};
  int take = nmb - byte;
  if (take > 16) take = 16;
  if (take > 0) memcpy(tmp, nm + byte, take);
  uint64_t lo, hi;
  memcpy(&lo, tmp, 8);
  memcpy(&hi, tmp + 8, 8);
  uint64_t x = sh ? ((lo >> sh) | (hi << (64 - sh))) : lo;
  uint64_t mask = (k >= 64) ? ~0ULL : ((1ULL << k) - 1);
  return (x & mask) != 0;
}

// 2-bit group reversal across 64 bits (abc...z -> z...cba)
static inline uint64_t rev2_64(uint64_t x) {
  x = ((x & 0x3333333333333333ULL) << 2) | ((x >> 2) & 0x3333333333333333ULL);
  x = ((x & 0x0F0F0F0F0F0F0F0FULL) << 4) | ((x >> 4) & 0x0F0F0F0F0F0F0F0FULL);
  x = ((x & 0x00FF00FF00FF00FFULL) << 8) | ((x >> 8) & 0x00FF00FF00FF00FFULL);
  x = ((x & 0x0000FFFF0000FFFFULL) << 16) |
      ((x >> 16) & 0x0000FFFF0000FFFFULL);
  return (x << 32) | (x >> 32);
}

static const int32_t kRowPad = 0x7FFFFFFF;  // INT32_MAX row padding

static inline bool w1_eval_mate(const W1Ctx& c, const uint8_t* pk,
                                const uint8_t* nm, MateEval* out) {
  const int rowb = c.Lp / 4, nmb = c.Lp / 8;
  const uint64_t kmask =
      (c.k == 32) ? ~0ULL : ((1ULL << (2 * c.k)) - 1);
  int32_t uid0 = 0, pos0 = 0, blo = 0, bhi = 0;
  uint8_t strand0 = 0;
  for (int j = 0; j < c.n_anchors; j++) {
    int w = c.ws[j];
    if (window_has_bit(nm, nmb, w, c.k)) return false;  // N in window
    uint64_t x = load_window2(pk, rowb, w, c.k);
    uint64_t f = rev2_64(x) >> (64 - 2 * c.k);
    uint64_t r = (~x) & kmask;
    bool fw = f <= r;
    uint64_t canon = fw ? f : r;
    uint64_t mq = mix64(canon);
    uint64_t b = c.p ? (mq >> (64 - c.p)) : 0;
    int64_t s = c.bucket_start[b], e = c.bucket_start[b + 1];
    while (s < e) {
      int64_t mid = (s + e) >> 1;
      if (c.mk[mid] < mq)
        s = mid + 1;
      else
        e = mid;
    }
    if (s >= c.bucket_start[b + 1] || c.mk[s] != mq) return false;  // miss
    int32_t uid = c.kuid[s], pos = c.kpos[s], blk = c.kblock[s];
    uint8_t strand = (fw == (bool)c.kfw[s]) ? 1 : 0;
    if (j == 0) {
      uid0 = uid;
      pos0 = pos;
      strand0 = strand;
      blo = bhi = blk;
      out->uid0 = uid;
      out->upos0 = pos;
      out->blk0 = blk;
      out->strand0 = strand;
    } else {
      if (uid != uid0 || strand != strand0) return false;
      int32_t expect = strand0 ? pos0 + w : pos0 - w;
      if (pos != expect) return false;
      if (blk < blo) blo = blk;
      if (blk > bhi) bhi = blk;
    }
  }
  if (blo < 0) return false;                 // D-list dummy unitig
  if (bhi - blo > 2 * c.rl + 16) return false;  // sanity cap on span
  out->blo = blo;
  out->bhi = bhi;
  // distinct sorted non-empty EC rows over the contiguous block range
  int nr = 0;
  for (int32_t fid = blo; fid <= bhi; fid++) {
    int32_t ec = c.block_ec[fid];
    if (ec < 0) continue;
    int q = nr;
    while (q > 0 && out->rows[q - 1] > ec) q--;
    if (q > 0 && out->rows[q - 1] == ec) continue;
    if (nr >= c.R) return false;  // row-budget overflow -> wave 2
    for (int m = nr; m > q; m--) out->rows[m] = out->rows[m - 1];
    out->rows[q] = ec;
    nr++;
  }
  out->nrows = nr;
  out->ok = true;
  return true;
}

// single-end FLD position-filter rank (must equal ops/pseudoalign.py
// pos_filter_rank exactly: lower_bound over the per-block sorted bases)
static inline int32_t w1_pos_rank(const W1Ctx& c, const MateEval& e) {
  int32_t b = e.blk0 < 0 ? 0 : e.blk0;
  int32_t lo0 = c.pf_ptr[b], hi = c.pf_ptr[b + 1];
  int64_t off = e.strand0 ? 0 : c.pf_np;
  // rpos is 0 for verified reads (first hit at window 0)
  int32_t target = e.strand0 ? e.upos0 + c.pos_fl : e.upos0 - c.pos_fl + 1;
  int32_t lo = lo0, h = hi;
  while (lo < h) {
    int32_t mid = (lo + h) >> 1;
    if (c.pf_base[off + mid] < target)
      lo = mid + 1;
    else
      h = mid;
  }
  return lo - lo0;
}

// 128-bit content hash over the exemplar columns (host namespace: seeds
// differ from the device _hash_columns_128, so host keys never alias
// device wave-2 keys in the shared EC cache)
static inline void w1_hash(const int32_t* ex, int W, int32_t extra,
                           bool use_extra, uint64_t* h1o, uint64_t* h2o) {
  uint64_t h1 = 0x9AE16A3B2F90404FULL, h2 = 0xC3A5C85C97CB3127ULL;
  const uint64_t m1 = 0x100000001B3ULL, m2 = 0xC2B2AE3D27D4EB4FULL;
  for (int i = 0; i < W; i++) {
    uint64_t cu = (uint64_t)(int64_t)ex[i];
    h1 = (h1 ^ cu) * m1;
    h2 = (h2 + cu) * m2;
    h2 ^= h2 >> 29;
  }
  if (use_extra) {
    uint64_t cu = (uint64_t)(int64_t)extra;
    h1 = (h1 ^ cu) * m1;
    h2 = (h2 + cu) * m2;
    h2 ^= h2 >> 29;
  }
  h1 ^= h1 >> 33;
  h2 *= m1;
  if (!(h1 | h2)) h1 = 1;  // 0/0 is the empty-slot marker
  *h1o = h1;
  *h2o = h2;
}

}  // namespace

extern "C" {

void* ktio_wave1(
    const uint64_t* mk, int64_t n_keys, const int64_t* bucket_start,
    int32_t p, const int32_t* kuid, const int32_t* kpos, const uint8_t* kfw,
    const int32_t* kblock, const int32_t* block_ec, int64_t n_blocks,
    const int32_t* pf_ptr, const int32_t* pf_base, int64_t pf_np,
    const uint8_t* packed1, const uint8_t* nmask1, const uint8_t* packed2,
    const uint8_t* nmask2, int64_t n, int32_t Lp, int32_t rl, int32_t k,
    int32_t R, int32_t n_anchors, const int32_t* anchor_ws,
    int32_t min_range, int32_t tail_mode, int32_t pos_fl, int32_t n_threads,
    int32_t* fail_idx, uint8_t* fail_side, int32_t* fail_vsum,
    int64_t* n_fail_out,
    // per-read fast-path extras (may be null): key hash h1 (0 for
    // failing reads), per-mate first-hit info (f_block, upos0<<1|strand),
    // and the mapPair fragment length (-1 when not inferable) for the
    // FLD-estimation fast path (reference: KmerIndex::mapPair,
    // src/KmerIndex.cpp:1622-1693 -- same unitig, same mosaic block,
    // opposite strands; first hits are at read position 0 here)
    uint64_t* out_rh1, int32_t* out_vinfo, int32_t* out_tl) {
  W1Ctx c{mk,     n_keys, bucket_start, p,  kuid, kpos,      kfw,
          kblock, block_ec, n_blocks,   pf_ptr, pf_base, pf_np,
          Lp,     rl,     k,  R, n_anchors, min_range, tail_mode, pos_fl,
          std::vector<int32_t>(anchor_ws, anchor_ws + n_anchors)};
  const bool paired = packed2 != nullptr;
  const int rowb = Lp / 4, nmb = Lp / 8;
  // exemplar width: rows (R per mate) + flags + optional tails
  int W = paired ? 2 * R + 1 : R + 1;
  if (tail_mode >= 1) W += paired ? 4 : 2;
  if (tail_mode >= 2) W += paired ? 4 : 2;
  const bool rank_in_key = (!paired) && pos_fl >= 0;
  // min_range veto is constant for a uniform read length: rng = rl - k,
  // veto <=> has_hits && (rng + k < min_range) <=> rl < min_range
  const int32_t veto = (min_range > 1 && rl < min_range) ? 1 : 0;

  int T = n_threads > 0 ? n_threads : 1;
  if (n < (1 << 14)) T = 1;
  std::vector<W1Map> maps(T);
  std::vector<std::vector<int32_t>> fails(T);
  std::vector<std::vector<uint8_t>> fsides(T);
  std::vector<std::vector<int32_t>> fvsums(T);
  auto work = [&](int t, int64_t lo, int64_t hi) {
    W1Map& map = maps[t];
    map.init(1 << 10);
    std::vector<int32_t>& fail = fails[t];
    std::vector<uint8_t>& fside = fsides[t];
    std::vector<int32_t>& fvs = fvsums[t];
    std::vector<int32_t> ex(W);
    for (int64_t i = lo; i < hi; i++) {
      MateEval e1, e2;
      e1.ok = e2.ok = false;
      bool ok1 = w1_eval_mate(c, packed1 + i * rowb, nmask1 + i * nmb, &e1);
      bool ok2 =
          !paired ||
          w1_eval_mate(c, packed2 + i * rowb, nmask2 + i * nmb, &e2);
      if (!ok1 || !ok2) {
        // failing pair: classify for the device leg.  side 1/2 = only
        // that mate failed and the OTHER mate's verified state packs
        // into an 8-byte summary (the device reconstructs its rows from
        // block_ec8, so only the failed mate's codes upload); side 3 =
        // both failed (or the summary doesn't pack) -> both upload.
        uint8_t side = 3;
        int32_t v0 = 0, v1 = 0;
        if (paired && (ok1 != ok2)) {
          const MateEval* v = ok1 ? &e1 : &e2;
          int span = v->bhi - v->blo;
          if ((v->bhi >> 3) <= (v->blo >> 3) + 1 && v->upos0 >= 0 &&
              v->upos0 < (1 << 26)) {
            side = ok1 ? 2 : 1;
            v0 = v->blo;
            v1 = (v->upos0 << 5) | (span << 1) | (v->strand0 ? 1 : 0);
          }
        } else if (!paired) {
          side = 1;
        }
        fail.push_back((int32_t)i);
        fside.push_back(side);
        fvs.push_back(v0);
        fvs.push_back(v1);
        continue;
      }
      int o = 0;
      for (int m = 0; m < e1.nrows; m++) ex[o++] = e1.rows[m];
      for (int m = e1.nrows; m < R; m++) ex[o++] = kRowPad;
      if (paired) {
        for (int m = 0; m < e2.nrows; m++) ex[o++] = e2.rows[m];
        for (int m = e2.nrows; m < R; m++) ex[o++] = kRowPad;
        ex[o++] = 1 + 2 + 16 * veto + 32 * veto;  // both mates hit
      } else {
        ex[o++] = 1 + 16 * veto;
      }
      if (tail_mode >= 1) {
        ex[o++] = e1.blk0;
        ex[o++] = e1.strand0;
        if (paired) {
          ex[o++] = e2.blk0;
          ex[o++] = e2.strand0;
        }
      }
      if (tail_mode >= 2) {
        ex[o++] = e1.upos0;
        ex[o++] = 0;  // rpos: first hit is window 0 for verified reads
        if (paired) {
          ex[o++] = e2.upos0;
          ex[o++] = 0;
        }
      }
      int32_t rank = rank_in_key ? w1_pos_rank(c, e1) : 0;
      uint64_t h1, h2;
      w1_hash(ex.data(), W, rank, rank_in_key, &h1, &h2);
      map.add(h1, h2, i, ex.data(), W);
      if (out_rh1) {
        out_rh1[i] = h1;
        out_vinfo[4 * i] = e1.strand0 ? e1.blo : e1.bhi;
        out_vinfo[4 * i + 1] = (e1.upos0 << 1) | e1.strand0;
        if (paired) {
          out_vinfo[4 * i + 2] = e2.strand0 ? e2.blo : e2.bhi;
          out_vinfo[4 * i + 3] = (e2.upos0 << 1) | e2.strand0;
        }
      }
      if (out_tl) {
        int32_t tl = -1;
        if (paired && e1.uid0 == e2.uid0 && e1.blk0 == e2.blk0 &&
            e1.strand0 != e2.strand0) {
          int32_t p1 = e1.strand0 ? e1.upos0 : e1.upos0 + k;
          int32_t p2 = e2.strand0 ? e2.upos0 : e2.upos0 + k;
          tl = p1 > p2 ? p1 - p2 : p2 - p1;
        }
        out_tl[i] = tl;
      }
    }
  };
  if (T == 1) {
    work(0, 0, n);
  } else {
    std::vector<std::thread> ths;
    int64_t per = (n + T - 1) / T;
    for (int t = 0; t < T; t++) {
      int64_t lo = t * per, hi = std::min<int64_t>(n, lo + per);
      if (lo < hi) ths.emplace_back(work, t, lo, hi);
    }
    for (auto& th : ths) th.join();
  }
  // merge thread maps into map 0 (same key => identical exemplar content)
  W1Map& m0 = maps[0];
  if (m0.cap == 0) m0.init(1 << 10);
  for (int t = 1; t < T; t++) {
    W1Map& mt = maps[t];
    for (auto& s : mt.slots) {
      if (!(s.h1 | s.h2)) continue;
      if ((m0.n + 1) * 4 >= m0.cap * 3) m0.grow();
      size_t i = (size_t)s.h1 & m0.mask;
      while (true) {
        W1Key& d = m0.slots[i];
        if (!(d.h1 | d.h2)) {
          d = s;
          d.ex_off = (int32_t)(m0.arena.size() / W);
          m0.arena.insert(m0.arena.end(), mt.arena.begin() + (size_t)s.ex_off * W,
                          mt.arena.begin() + (size_t)(s.ex_off + 1) * W);
          m0.n++;
          break;
        }
        if (d.h1 == s.h1 && d.h2 == s.h2) {
          d.count += s.count;
          if (s.first < d.first) d.first = s.first;
          break;
        }
        i = (i + 1) & m0.mask;
      }
    }
  }
  // emit fails in ascending read order (chunk order is ascending)
  int64_t nf = 0;
  for (int t = 0; t < T; t++) {
    memcpy(fail_idx + nf, fails[t].data(), fails[t].size() * 4);
    memcpy(fail_side + nf, fsides[t].data(), fsides[t].size());
    memcpy(fail_vsum + 2 * nf, fvsums[t].data(), fvsums[t].size() * 4);
    nf += (int64_t)fails[t].size();
  }
  *n_fail_out = nf;

  auto* res = new W1Result();
  res->width = W;
  res->h1.reserve(m0.n);
  for (auto& s : m0.slots) {
    if (!(s.h1 | s.h2)) continue;
    res->h1.push_back(s.h1);
    res->h2.push_back(s.h2);
    res->first.push_back(s.first);
    res->count.push_back(s.count);
    res->ex.insert(res->ex.end(), m0.arena.begin() + (size_t)s.ex_off * W,
                   m0.arena.begin() + (size_t)(s.ex_off + 1) * W);
  }
  return res;
}

int64_t ktio_wave1_nkeys(void* h) { return (int64_t)((W1Result*)h)->h1.size(); }
int32_t ktio_wave1_width(void* h) { return ((W1Result*)h)->width; }

void ktio_wave1_fetch(void* h, uint64_t* h1, uint64_t* h2, int64_t* first,
                      int64_t* count, int32_t* ex) {
  auto* r = (W1Result*)h;
  size_t K = r->h1.size();
  memcpy(h1, r->h1.data(), K * 8);
  memcpy(h2, r->h2.data(), K * 8);
  memcpy(first, r->first.data(), K * 8);
  memcpy(count, r->count.data(), K * 8);
  memcpy(ex, r->ex.data(), r->ex.size() * 4);
}

void ktio_wave1_free(void* h) { delete (W1Result*)h; }

}  // extern "C"
