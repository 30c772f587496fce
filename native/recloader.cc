// Native data loader: TFRecord + tf.Example -> hashed, padded device batches.
//
// TPU-native counterpart of the reference's C++ data plane (tensornet's
// readers + tf.data interleave, reference staytime/parse.py:73-92): parses
// TFRecord shards of tf.Example protos, extracts configured int64 VarLen
// features, hashes feasigns with splitmix64 into per-feature bucket spaces
// (identical constants to embedding/feature_column.py), pads to static
// (batch, max_len) int32 row / float32 mask buffers, and prefetches batches
// on a background thread.  Exposed as a C ABI for ctypes (no pybind11 in
// the image).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC recloader.cc -o librecloader.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// ---------------- crc32c (Castagnoli) ----------------

uint32_t crc_table[256];
bool crc_init_done = false;

void crc_init() {
  if (crc_init_done) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t crc = i;
    for (int j = 0; j < 8; j++)
      crc = (crc & 1) ? (crc >> 1) ^ 0x82F63B78u : crc >> 1;
    crc_table[i] = crc;
  }
  crc_init_done = true;
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; i++)
    crc = crc_table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t masked_crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// ---------------- splitmix64 (must match feature_column.py) ----------------

uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ull;
  x ^= x >> 30;
  x *= 0xBF58476D1CE4E5B9ull;
  x ^= x >> 27;
  x *= 0x94D049BB133111EBull;
  x ^= x >> 31;
  return x;
}

// ---------------- varint / tf.Example parsing ----------------

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t result = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      result |= uint64_t(b & 0x7F) << shift;
      if (!(b & 0x80)) return result;
      shift += 7;
      if (shift >= 64) break;
    }
    ok = false;
    return 0;
  }

  void skip(int wire) {
    switch (wire) {
      case 0: varint(); break;
      case 1: p += 8; break;
      case 2: { uint64_t n = varint(); p += n; break; }
      case 5: p += 4; break;
      default: ok = false;
    }
    if (p > end) ok = false;
  }
};

struct ParsedFeature {
  std::vector<int64_t> int64s;
  std::vector<float> floats;
  std::vector<std::string> bytes;
};

// Parse a Feature message (bytes_list=1 / float_list=2 / int64_list=3).
void parse_feature(const uint8_t* data, size_t n, ParsedFeature* out) {
  Cursor c{data, data + n};
  while (c.ok && c.p < c.end) {
    uint64_t tag = c.varint();
    uint32_t field = tag >> 3, wire = tag & 7;
    if (wire != 2 || field < 1 || field > 3) { c.skip(wire); continue; }
    uint64_t len = c.varint();
    if (!c.ok || c.p + len > c.end) break;
    const uint8_t* sub = c.p;
    const uint8_t* sub_end = sub + len;
    c.p = sub_end;
    Cursor s{sub, sub_end};
    while (s.ok && s.p < s.end) {
      uint64_t t2 = s.varint();
      uint32_t f2 = t2 >> 3, w2 = t2 & 7;
      if (f2 != 1) { s.skip(w2); continue; }
      if (field == 3) {                       // int64_list
        if (w2 == 2) {                        // packed
          uint64_t ln = s.varint();
          const uint8_t* stop = s.p + ln;
          while (s.ok && s.p < stop) out->int64s.push_back(int64_t(s.varint()));
        } else {
          out->int64s.push_back(int64_t(s.varint()));
        }
      } else if (field == 2) {                // float_list
        if (w2 == 2) {
          uint64_t ln = s.varint();
          if (!s.ok || s.p + ln > s.end) { s.ok = false; break; }
          for (uint64_t i = 0; i + 4 <= ln; i += 4) {
            float f;
            memcpy(&f, s.p + i, 4);
            out->floats.push_back(f);
          }
          s.p += ln;
        } else {
          if (s.p + 4 > s.end) { s.ok = false; break; }
          float f;
          memcpy(&f, s.p, 4);
          s.p += 4;
          out->floats.push_back(f);
        }
      } else {                                // bytes_list
        uint64_t ln = s.varint();
        if (!s.ok || s.p + ln > s.end) { s.ok = false; break; }
        out->bytes.emplace_back(reinterpret_cast<const char*>(s.p), ln);
        s.p += ln;
      }
    }
  }
}

// Parse Example -> map name -> ParsedFeature (only requested names kept).
void parse_example(const uint8_t* data, size_t n,
                   const std::unordered_map<std::string, std::vector<int>>& want,
                   std::vector<ParsedFeature>* out) {
  Cursor c{data, data + n};
  while (c.ok && c.p < c.end) {
    uint64_t tag = c.varint();
    if ((tag >> 3) != 1 || (tag & 7) != 2) { c.skip(tag & 7); continue; }
    uint64_t flen = c.varint();
    if (!c.ok || c.p + flen > c.end) break;
    Cursor feats{c.p, c.p + flen};
    c.p += flen;
    while (feats.ok && feats.p < feats.end) {
      uint64_t t2 = feats.varint();
      if ((t2 >> 3) != 1 || (t2 & 7) != 2) { feats.skip(t2 & 7); continue; }
      uint64_t elen = feats.varint();
      if (!feats.ok || feats.p + elen > feats.end) break;
      Cursor entry{feats.p, feats.p + elen};
      feats.p += elen;
      std::string key;
      const uint8_t* fdata = nullptr;
      uint64_t fsize = 0;
      while (entry.ok && entry.p < entry.end) {
        uint64_t t3 = entry.varint();
        uint32_t f3 = t3 >> 3, w3 = t3 & 7;
        if (f3 == 1 && w3 == 2) {
          uint64_t kn = entry.varint();
          if (!entry.ok || entry.p + kn > entry.end) break;
          key.assign(reinterpret_cast<const char*>(entry.p), kn);
          entry.p += kn;
        } else if (f3 == 2 && w3 == 2) {
          fsize = entry.varint();
          if (!entry.ok || entry.p + fsize > entry.end) break;
          fdata = entry.p;
          entry.p += fsize;
        } else {
          entry.skip(w3);
        }
      }
      auto it = want.find(key);
      if (it != want.end() && fdata) {
        // a slot may feed several columns (mean + sequence views share one
        // categorical key, staytime/VideoDnn.py:224-231)
        for (size_t wi = 0; wi < it->second.size(); wi++) {
          int idx = it->second[wi];
          if (wi == 0) {
            parse_feature(fdata, fsize, &(*out)[idx]);
          } else {
            (*out)[idx] = (*out)[it->second[0]];
          }
        }
      }
    }
  }
}

// ---------------- TFRecord file reader ----------------

class TFRecordFile {
 public:
  explicit TFRecordFile(const std::string& path, bool verify)
      : in_(path, std::ios::binary), verify_(verify) {}

  bool ok() const { return in_.good(); }

  bool next(std::string* record) {
    uint8_t header[12];
    if (!in_.read(reinterpret_cast<char*>(header), 12)) return false;
    uint64_t length;
    memcpy(&length, header, 8);
    if (verify_) {
      uint32_t crc;
      memcpy(&crc, header + 8, 4);
      if (masked_crc32c(header, 8) != crc) return false;
    }
    record->resize(length);
    if (!in_.read(record->data(), length)) return false;
    uint8_t footer[4];
    if (!in_.read(reinterpret_cast<char*>(footer), 4)) return false;
    if (verify_) {
      uint32_t crc;
      memcpy(&crc, footer, 4);
      if (masked_crc32c(reinterpret_cast<const uint8_t*>(record->data()),
                        length) != crc)
        return false;
    }
    return true;
  }

 private:
  std::ifstream in_;
  bool verify_;
};

// cycle/block interleave over a file list (staytime/parse.py:81-83 shape)
class Interleaver {
 public:
  Interleaver(std::vector<std::string> files, int cycle, int block, bool verify)
      : pending_(files.begin(), files.end()), cycle_(cycle), block_(block),
        verify_(verify) {}

  bool next(std::string* record) {
    while (true) {
      refill();
      if (active_.empty()) return false;
      if (pos_ >= active_.size()) { pos_ = 0; served_ = 0; }
      auto& f = active_[pos_];
      if (f->next(record)) {
        if (++served_ >= block_) { pos_++; served_ = 0; }
        return true;
      }
      active_.erase(active_.begin() + pos_);
      served_ = 0;
    }
  }

 private:
  void refill() {
    while ((int)active_.size() < cycle_ && !pending_.empty()) {
      auto f = std::make_unique<TFRecordFile>(pending_.front(), verify_);
      pending_.pop_front();
      if (f->ok()) active_.push_back(std::move(f));
    }
  }

  std::deque<std::string> pending_;
  std::vector<std::unique_ptr<TFRecordFile>> active_;
  size_t pos_ = 0;
  int served_ = 0;
  int cycle_, block_;
  bool verify_;
};

// ---------------- batch assembly + prefetch ----------------

struct Batch {
  // per feature: rows (batch*max_len) int32, mask (batch*max_len) float
  std::vector<std::vector<int32_t>> rows;
  std::vector<std::vector<float>> mask;
  std::vector<std::vector<int64_t>> scalars;   // per scalar feature (batch,)
  int count = 0;
};

struct LoaderConfig {
  std::vector<std::string> features;     // hashed VarLen int64 slots
  std::vector<int64_t> buckets;
  std::vector<int> max_lens;
  std::vector<std::string> scalar_features;  // raw int64 scalars (labels)
  int batch_size;
  int cycle, block;
  bool verify;
};

class Loader {
 public:
  Loader(std::vector<std::string> files, LoaderConfig cfg)
      : cfg_(std::move(cfg)),
        interleaver_(std::move(files), cfg_.cycle, cfg_.block, cfg_.verify) {
    crc_init();
    for (size_t i = 0; i < cfg_.features.size(); i++)
      want_[cfg_.features[i]].push_back(int(i));
    int base = int(cfg_.features.size());
    for (size_t i = 0; i < cfg_.scalar_features.size(); i++)
      want_[cfg_.scalar_features[i]].push_back(base + int(i));
    thread_ = std::thread([this] { run(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    thread_.join();
  }

  // Returns rows produced (0 = end of data).
  int next(int32_t** rows_out, float** mask_out, int64_t** scalars_out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [this] { return !queue_.empty() || done_; });
    if (queue_.empty()) return 0;
    current_ = std::move(queue_.front());
    queue_.pop_front();
    lk.unlock();
    cv_space_.notify_one();
    for (size_t i = 0; i < cfg_.features.size(); i++) {
      rows_out[i] = current_.rows[i].data();
      mask_out[i] = current_.mask[i].data();
    }
    for (size_t i = 0; i < cfg_.scalar_features.size(); i++)
      scalars_out[i] = current_.scalars[i].data();
    return current_.count;
  }

 private:
  void run() {
    const int nf = int(cfg_.features.size());
    const int ns = int(cfg_.scalar_features.size());
    std::string record;
    bool exhausted = false;
    while (!exhausted) {
      Batch b;
      b.rows.resize(nf);
      b.mask.resize(nf);
      b.scalars.resize(ns);
      for (int i = 0; i < nf; i++) {
        b.rows[i].assign(size_t(cfg_.batch_size) * cfg_.max_lens[i], 0);
        b.mask[i].assign(size_t(cfg_.batch_size) * cfg_.max_lens[i], 0.f);
      }
      for (int i = 0; i < ns; i++) b.scalars[i].assign(cfg_.batch_size, 0);

      std::vector<ParsedFeature> parsed(nf + ns);
      for (int row = 0; row < cfg_.batch_size; row++) {
        if (!interleaver_.next(&record)) { exhausted = true; break; }
        for (auto& p : parsed) { p.int64s.clear(); p.floats.clear(); p.bytes.clear(); }
        parse_example(reinterpret_cast<const uint8_t*>(record.data()),
                      record.size(), want_, &parsed);
        for (int i = 0; i < nf; i++) {
          const auto& vals = parsed[i].int64s;
          int L = cfg_.max_lens[i];
          int n = std::min<int>(int(vals.size()), L);
          for (int j = 0; j < n; j++) {
            uint64_t h = splitmix64(uint64_t(vals[j])) % uint64_t(cfg_.buckets[i]);
            b.rows[i][size_t(row) * L + j] = int32_t(h);
            b.mask[i][size_t(row) * L + j] = 1.f;
          }
        }
        for (int i = 0; i < ns; i++) {
          const auto& vals = parsed[nf + i].int64s;
          if (!vals.empty()) b.scalars[i][row] = vals[0];
        }
        b.count++;
      }

      if (b.count > 0) {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk, [this] { return queue_.size() < 4 || stop_; });
        if (stop_) return;
        queue_.push_back(std::move(b));
        lk.unlock();
        cv_data_.notify_one();
      }
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_data_.notify_all();
  }

  LoaderConfig cfg_;
  Interleaver interleaver_;
  std::unordered_map<std::string, std::vector<int>> want_;
  std::thread thread_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::deque<Batch> queue_;
  Batch current_;
  bool done_ = false;
  bool stop_ = false;
};

// ---------------- TFRecord writer ----------------

class TFRecordWriter {
 public:
  explicit TFRecordWriter(const std::string& path)
      : out_(path, std::ios::binary) {
    crc_init();
  }

  bool ok() const { return out_.good(); }

  bool write(const uint8_t* data, size_t n) {
    uint8_t header[12];
    uint64_t length = n;
    memcpy(header, &length, 8);
    uint32_t len_crc = masked_crc32c(header, 8);
    memcpy(header + 8, &len_crc, 4);
    out_.write(reinterpret_cast<const char*>(header), 12);
    out_.write(reinterpret_cast<const char*>(data), n);
    uint32_t data_crc = masked_crc32c(data, n);
    out_.write(reinterpret_cast<const char*>(&data_crc), 4);
    return out_.good();
  }

 private:
  std::ofstream out_;
};

}  // namespace

// ---------------- C ABI ----------------

extern "C" {

void* rec_loader_create(const char** paths, int num_paths,
                        const char** features, const int64_t* buckets,
                        const int* max_lens, int num_features,
                        const char** scalar_features, int num_scalars,
                        int batch_size, int cycle_length, int block_length,
                        int verify_crc) {
  std::vector<std::string> files(paths, paths + num_paths);
  LoaderConfig cfg;
  for (int i = 0; i < num_features; i++) {
    cfg.features.emplace_back(features[i]);
    cfg.buckets.push_back(buckets[i]);
    cfg.max_lens.push_back(max_lens[i]);
  }
  for (int i = 0; i < num_scalars; i++)
    cfg.scalar_features.emplace_back(scalar_features[i]);
  cfg.batch_size = batch_size;
  cfg.cycle = cycle_length;
  cfg.block = block_length;
  cfg.verify = verify_crc != 0;
  return new Loader(std::move(files), std::move(cfg));
}

int rec_loader_next(void* loader, int32_t** rows_out, float** mask_out,
                    int64_t** scalars_out) {
  return static_cast<Loader*>(loader)->next(rows_out, mask_out, scalars_out);
}

void rec_loader_destroy(void* loader) { delete static_cast<Loader*>(loader); }

uint64_t rec_splitmix64(uint64_t x) { return splitmix64(x); }

uint32_t rec_crc32c(const uint8_t* data, size_t n) {
  crc_init();
  return crc32c(data, n);
}

void* rec_writer_create(const char* path) {
  auto* w = new TFRecordWriter(path);
  if (!w->ok()) {
    delete w;
    return nullptr;
  }
  return w;
}

int rec_writer_write(void* writer, const uint8_t* data, size_t n) {
  return static_cast<TFRecordWriter*>(writer)->write(data, n) ? 1 : 0;
}

void rec_writer_destroy(void* writer) {
  delete static_cast<TFRecordWriter*>(writer);
}

}  // extern "C"
