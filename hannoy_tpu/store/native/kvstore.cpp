// Native host KV store — the LMDB-equivalent persistence engine.
//
// C++ replacement for the reference's storage substrate (heed/LMDB,
// SURVEY §1 L0). Same durable format as the Python backend in
// ../env.py (append-only log of committed batches, magic "HNYT"), so the
// two backends open each other's files; this engine adds:
//
//   * MVCC snapshots: commits publish an immutable generation
//     (shared_ptr-swapped); read transactions pin a generation and never
//     block — LMDB's readers-don't-block-writers contract
//     (reference README.md:13).
//   * Crash consistency: a batch is visible only after fsync; torn tails
//     are truncated on open (nothing persists until commit,
//     SURVEY §5 checkpoint/resume).
//   * Sorted-key tables per named database: 8-byte big-endian keys are
//     stored as host u64 (order-preserving), so point gets are
//     binary searches and prefix scans are range scans
//     (reference src/key.rs prefix iteration).
//   * Bulk item staging: one call decodes an index's vector rows into a
//     caller-provided contiguous buffer — the hot path when loading a
//     graph into HBM (replaces the reference's madvise prefetch walk,
//     src/reader.rs:446-543).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/file.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[4] = {'H', 'N', 'Y', 'T'};
constexpr uint8_t kLogVersion = 1;
constexpr uint8_t kOpDel = 0;
constexpr uint8_t kOpPut = 1;

inline uint64_t key_to_u64(const uint8_t* k) {
  uint64_t v = 0;
  for (int i = 0; i < 8; i++) v = (v << 8) | k[i];
  return v;
}

inline void u64_to_key(uint64_t v, uint8_t* out) {
  for (int i = 7; i >= 0; i--) {
    out[i] = v & 0xff;
    v >>= 8;
  }
}

// One named database inside a generation: sorted (key, value) rows.
struct Table {
  std::vector<uint64_t> keys;           // sorted
  std::vector<std::string> values;      // parallel to keys
  int64_t find(uint64_t key) const {
    auto it = std::lower_bound(keys.begin(), keys.end(), key);
    if (it == keys.end() || *it != key) return -1;
    return it - keys.begin();
  }
};

struct Generation {
  std::map<std::string, Table> tables;
  uint64_t gen_id = 0;
};

using GenPtr = std::shared_ptr<const Generation>;

struct Overlay {
  // name -> (key -> value or nullopt-as-deleted)
  std::map<std::string, std::map<uint64_t, std::pair<bool, std::string>>> tables;
  uint64_t bytes = 0;
};

struct Env {
  std::string log_path;
  FILE* log = nullptr;
  int lock_fd = -1;  // sidecar hannoy.lock, held for the env's lifetime
  uint64_t map_size = 0;
  std::atomic<uint64_t> live_bytes{0};
  GenPtr gen;
  std::mutex write_mu;   // single writer
  std::mutex swap_mu;    // generation swap
  std::string error;
};

struct Txn {
  Env* env;
  GenPtr gen;      // pinned snapshot
  Overlay* overlay;  // null for read txns
};

// ---------------------------------------------------------------------------
// Log replay / append (format identical to env.py)
// ---------------------------------------------------------------------------

bool replay_log(Env* env) {
  auto gen = std::make_shared<Generation>();
  FILE* f = fopen(env->log_path.c_str(), "rb");
  if (!f) {
    env->gen = gen;
    return true;  // fresh store
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(size);
  if (size && fread(data.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    env->error = "short read on log";
    return false;
  }
  fclose(f);

  // temp mutable tables as std::map for O(log n) replay, sort once at end
  std::map<std::string, std::map<uint64_t, std::string>> tmp;
  uint64_t live = 0;
  size_t pos = 0, valid_end = 0;
  while (pos + 9 <= data.size()) {
    if (memcmp(&data[pos], kMagic, 4) != 0) break;
    uint8_t version = data[pos + 4];
    uint32_t plen = (data[pos + 5] << 24) | (data[pos + 6] << 16) |
                    (data[pos + 7] << 8) | data[pos + 8];
    if (version != kLogVersion || pos + 9 + plen > data.size()) break;
    size_t p = pos + 9, end = pos + 9 + plen;
    while (p < end) {
      uint8_t op = data[p];
      uint16_t nlen = (data[p + 1] << 8) | data[p + 2];
      p += 3;
      std::string name((const char*)&data[p], nlen);
      p += nlen;
      auto& table = tmp[name];
      if (op == kOpPut) {
        uint16_t klen = (data[p] << 8) | data[p + 1];
        uint32_t vlen = (data[p + 2] << 24) | (data[p + 3] << 16) |
                        (data[p + 4] << 8) | data[p + 5];
        p += 6;
        uint64_t key = key_to_u64(&data[p]);
        p += klen;
        std::string val((const char*)&data[p], vlen);
        p += vlen;
        auto it = table.find(key);
        if (it != table.end()) live -= 24 + it->second.size();
        live += 24 + val.size();
        table[key] = std::move(val);
      } else {
        uint16_t klen = (data[p] << 8) | data[p + 1];
        p += 2;
        uint64_t key = key_to_u64(&data[p]);
        p += klen;
        auto it = table.find(key);
        if (it != table.end()) {
          live -= 24 + it->second.size();
          table.erase(it);
        }
      }
    }
    valid_end = end;
    pos = end;
  }
  if (valid_end < data.size()) {
    // torn tail from a crash — truncate so future appends start clean
    if (truncate(env->log_path.c_str(), valid_end) != 0) {
      env->error = "failed to truncate torn log tail";
      return false;
    }
  }
  for (auto& [name, m] : tmp) {
    Table t;
    t.keys.reserve(m.size());
    t.values.reserve(m.size());
    for (auto& [k, v] : m) {
      t.keys.push_back(k);
      t.values.push_back(std::move(v));
    }
    gen->tables.emplace(name, std::move(t));
  }
  env->live_bytes = live;
  env->gen = gen;
  return true;
}

void append_u16(std::string& out, uint16_t v) {
  out.push_back((char)(v >> 8));
  out.push_back((char)(v & 0xff));
}
void append_u32(std::string& out, uint32_t v) {
  out.push_back((char)(v >> 24));
  out.push_back((char)((v >> 16) & 0xff));
  out.push_back((char)((v >> 8) & 0xff));
  out.push_back((char)(v & 0xff));
}

std::string serialize_batch(const Overlay& ov) {
  std::string body;
  uint8_t kb[8];
  for (const auto& [name, table] : ov.tables) {
    for (const auto& [key, pv] : table) {
      body.push_back((char)(pv.first ? kOpPut : kOpDel));
      append_u16(body, (uint16_t)name.size());
      body += name;
      u64_to_key(key, kb);
      if (pv.first) {
        append_u16(body, 8);
        append_u32(body, (uint32_t)pv.second.size());
        body.append((const char*)kb, 8);
        body += pv.second;
      } else {
        append_u16(body, 8);
        body.append((const char*)kb, 8);
      }
    }
  }
  std::string out;
  out.append(kMagic, 4);
  out.push_back((char)kLogVersion);
  append_u32(out, (uint32_t)body.size());
  out += body;
  return out;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

Env* hny_open(const char* dir, uint64_t map_size) {
  auto* env = new Env();
  std::string d(dir);
  ::mkdir(d.c_str(), 0755);
  env->log_path = d + "/hannoy.log";
  env->map_size = map_size;
  if (!replay_log(env)) {
    delete env;
    return nullptr;
  }
  // one owning process per environment: the append-only log has no
  // cross-process coordination (unlike LMDB's shared locks); a second
  // writer would interleave batches and corrupt the tail. The lock lives
  // on a sidecar file (not the log fd) so compaction's rename of the log
  // can never drop the exclusivity guarantee.
  std::string lock_path = d + "/hannoy.lock";
  env->lock_fd = ::open(lock_path.c_str(), O_CREAT | O_RDWR, 0644);
  if (env->lock_fd < 0 || flock(env->lock_fd, LOCK_EX | LOCK_NB) != 0) {
    if (env->lock_fd >= 0) ::close(env->lock_fd);
    delete env;
    return nullptr;
  }
  env->log = fopen(env->log_path.c_str(), "ab");
  if (!env->log) {
    ::close(env->lock_fd);
    delete env;
    return nullptr;
  }
  return env;
}

void hny_close(Env* env) {
  if (!env) return;
  if (env->log) fclose(env->log);
  if (env->lock_fd >= 0) ::close(env->lock_fd);
  delete env;
}

uint64_t hny_gen_id(Env* env) { return env->gen->gen_id; }
uint64_t hny_live_bytes(Env* env) { return env->live_bytes.load(); }

Txn* hny_ro_begin(Env* env) {
  auto* t = new Txn{env, nullptr, nullptr};
  std::lock_guard<std::mutex> g(env->swap_mu);
  t->gen = env->gen;
  return t;
}

Txn* hny_rw_begin(Env* env) {
  env->write_mu.lock();
  auto* t = new Txn{env, nullptr, new Overlay()};
  {
    std::lock_guard<std::mutex> g(env->swap_mu);
    t->gen = env->gen;
  }
  return t;
}

void hny_ro_end(Txn* t) { delete t; }

void hny_rw_abort(Txn* t) {
  t->env->write_mu.unlock();
  delete t->overlay;
  delete t;
}

// returns 0 ok, -1 full, -2 io error
int hny_put(Txn* t, const char* name, const uint8_t* key, const uint8_t* val,
            uint32_t vlen) {
  uint64_t k = key_to_u64(key);
  t->overlay->bytes += 24 + vlen;
  if (t->overlay->bytes + t->env->live_bytes.load() > t->env->map_size) return -1;
  (*t->overlay).tables[name][k] = {true, std::string((const char*)val, vlen)};
  return 0;
}

// Batched put: n records with 8-byte keys packed in `keys` and values
// concatenated in `vals` at offsets `val_offs` (n+1 entries, bytes).
// One C call replaces n ctypes round trips — the link-flush hot path.
// returns 0 ok, -1 full.
int hny_put_many(Txn* t, const char* name, const uint8_t* keys,
                 const uint8_t* vals, const uint64_t* val_offs, int64_t n) {
  auto& table = t->overlay->tables[name];
  uint64_t bytes = t->overlay->bytes;
  for (int64_t i = 0; i < n; i++) {
    uint64_t len = val_offs[i + 1] - val_offs[i];
    bytes += 24 + len;
  }
  if (bytes + t->env->live_bytes.load() > t->env->map_size) return -1;
  t->overlay->bytes = bytes;
  for (int64_t i = 0; i < n; i++) {
    uint64_t k = key_to_u64(keys + i * 8);
    uint64_t len = val_offs[i + 1] - val_offs[i];
    table[k] = {true, std::string((const char*)vals + val_offs[i], len)};
  }
  return 0;
}

// returns 1 if key existed (snapshot ∪ overlay view), else 0
int hny_del(Txn* t, const char* name, const uint8_t* key) {
  uint64_t k = key_to_u64(key);
  int existed = 0;
  auto ot = t->overlay->tables.find(name);
  bool in_overlay = false;
  if (ot != t->overlay->tables.end()) {
    auto it = ot->second.find(k);
    if (it != ot->second.end()) {
      existed = it->second.first ? 1 : 0;
      in_overlay = true;
    }
  }
  if (!in_overlay) {
    auto gt = t->gen->tables.find(name);
    if (gt != t->gen->tables.end() && gt->second.find(k) >= 0) existed = 1;
  }
  (*t->overlay).tables[name][k] = {false, std::string()};
  return existed;
}

// returns value length, or -1 if absent. Copies up to cap bytes into out.
int64_t hny_get(Txn* t, const char* name, const uint8_t* key, uint8_t* out,
                uint64_t cap) {
  uint64_t k = key_to_u64(key);
  const std::string* val = nullptr;
  if (t->overlay) {
    auto ot = t->overlay->tables.find(name);
    if (ot != t->overlay->tables.end()) {
      auto it = ot->second.find(k);
      if (it != ot->second.end()) {
        if (!it->second.first) return -1;
        val = &it->second.second;
      }
    }
  }
  if (!val) {
    auto gt = t->gen->tables.find(name);
    if (gt == t->gen->tables.end()) return -1;
    int64_t i = gt->second.find(k);
    if (i < 0) return -1;
    val = &gt->second.values[i];
  }
  uint64_t n = std::min<uint64_t>(cap, val->size());
  if (out && n) memcpy(out, val->data(), n);
  return (int64_t)val->size();
}

// Prefix scan: fills up to cap keys (u64 host order) that fall inside
// [lo, hi); returns the number written and sets *more if truncated.
// Write transactions see their overlay merged in.
int64_t hny_scan_keys(Txn* t, const char* name, uint64_t lo, uint64_t hi,
                      uint64_t* out_keys, int64_t cap, int* more) {
  *more = 0;
  std::vector<uint64_t> merged;
  auto gt = t->gen->tables.find(name);
  if (gt != t->gen->tables.end()) {
    const auto& keys = gt->second.keys;
    auto a = std::lower_bound(keys.begin(), keys.end(), lo);
    auto b = std::lower_bound(keys.begin(), keys.end(), hi);
    merged.assign(a, b);
  }
  if (t->overlay) {
    auto ot = t->overlay->tables.find(name);
    if (ot != t->overlay->tables.end()) {
      for (auto it = ot->second.lower_bound(lo);
           it != ot->second.end() && it->first < hi; ++it) {
        auto pos = std::lower_bound(merged.begin(), merged.end(), it->first);
        bool present = pos != merged.end() && *pos == it->first;
        if (it->second.first) {
          if (!present) merged.insert(pos, it->first);
        } else if (present) {
          merged.erase(pos);
        }
      }
    }
  }
  int64_t n = std::min<int64_t>((int64_t)merged.size(), cap);
  memcpy(out_keys, merged.data(), n * sizeof(uint64_t));
  if ((int64_t)merged.size() > cap) *more = 1;
  return n;
}

// Bulk (key, value) range scan: fills up to `cap` entries whose keys fall
// in [lo, hi), concatenating values into `out_vals` (capacity vals_cap
// bytes) with per-entry lengths in `out_lens`. Stops early when the next
// value would overflow vals_cap and sets *more; the caller resumes with
// lo = last_key + 1. Write transactions see their overlay merged in.
// Replaces the per-key hny_get round trips of prefix iteration — the
// journal-scan / graph-load path at 10M rows.
int64_t hny_scan_vals(Txn* t, const char* name, uint64_t lo, uint64_t hi,
                      uint64_t* out_keys, uint32_t* out_lens,
                      uint8_t* out_vals, uint64_t vals_cap, int64_t cap,
                      int* more) {
  *more = 0;
  const Table* table = nullptr;
  auto gt = t->gen->tables.find(name);
  if (gt != t->gen->tables.end()) table = &gt->second;
  const std::map<uint64_t, std::pair<bool, std::string>>* ov = nullptr;
  if (t->overlay) {
    auto ot = t->overlay->tables.find(name);
    if (ot != t->overlay->tables.end()) ov = &ot->second;
  }
  size_t gi = 0, gn = 0;
  if (table) {
    gi = std::lower_bound(table->keys.begin(), table->keys.end(), lo) -
         table->keys.begin();
    gn = std::lower_bound(table->keys.begin(), table->keys.end(), hi) -
         table->keys.begin();
  }
  auto oi = ov ? ov->lower_bound(lo) : std::map<uint64_t, std::pair<bool, std::string>>::const_iterator();
  int64_t n = 0;
  uint64_t used = 0;
  while (true) {
    bool g_ok = table && gi < gn;
    bool o_ok = ov && oi != ov->end() && oi->first < hi;
    if (!g_ok && !o_ok) break;
    uint64_t key;
    const std::string* val = nullptr;
    if (o_ok && (!g_ok || oi->first <= table->keys[gi])) {
      key = oi->first;
      if (g_ok && table->keys[gi] == key) gi++;  // overlay shadows base
      if (oi->second.first) val = &oi->second.second;
      ++oi;
      if (!val) continue;  // tombstone
    } else {
      key = table->keys[gi];
      val = &table->values[gi];
      gi++;
    }
    if (n >= cap || used + val->size() > vals_cap) {
      *more = 1;
      break;
    }
    out_keys[n] = key;
    out_lens[n] = (uint32_t)val->size();
    memcpy(out_vals + used, val->data(), val->size());
    used += val->size();
    n++;
  }
  return n;
}

// Commit: append batch + fsync, then publish the next generation.
// returns 0 ok, -2 io error.
int hny_commit(Txn* t) {
  Env* env = t->env;
  std::string batch = serialize_batch(*t->overlay);
  // Record the pre-batch offset so a failed append can be rolled back —
  // torn bytes left mid-log would make replay_log truncate away *later*
  // successfully-committed batches on the next open.
  fseek(env->log, 0, SEEK_END);
  long pre = ftell(env->log);
  if (fwrite(batch.data(), 1, batch.size(), env->log) != batch.size() ||
      fflush(env->log) != 0 || fsync(fileno(env->log)) != 0) {
    clearerr(env->log);
    if (pre >= 0 && ftruncate(fileno(env->log), pre) == 0) {
      fseek(env->log, 0, SEEK_END);
      fsync(fileno(env->log));
    }
    env->write_mu.unlock();
    delete t->overlay;
    delete t;
    return -2;
  }

  auto next = std::make_shared<Generation>();
  next->gen_id = env->gen->gen_id + 1;
  next->tables = env->gen->tables;  // copy (tables are value types)
  uint64_t live = env->live_bytes.load();
  for (auto& [name, ov] : t->overlay->tables) {
    auto& table = next->tables[name];
    // merge overlay into sorted arrays
    std::vector<uint64_t> keys;
    std::vector<std::string> values;
    keys.reserve(table.keys.size() + ov.size());
    values.reserve(keys.capacity());
    size_t i = 0;
    auto it = ov.begin();
    while (i < table.keys.size() || it != ov.end()) {
      bool take_old;
      if (i >= table.keys.size()) take_old = false;
      else if (it == ov.end()) take_old = true;
      else take_old = table.keys[i] < it->first;
      if (take_old) {
        keys.push_back(table.keys[i]);
        values.push_back(table.values[i]);
        i++;
      } else {
        bool replace = i < table.keys.size() && table.keys[i] == it->first;
        if (replace) {
          live -= 24 + table.values[i].size();
          i++;
        }
        if (it->second.first) {
          live += 24 + it->second.second.size();
          keys.push_back(it->first);
          values.push_back(it->second.second);
        }
        ++it;
      }
    }
    table.keys = std::move(keys);
    table.values = std::move(values);
  }
  env->live_bytes = live;
  {
    std::lock_guard<std::mutex> g(env->swap_mu);
    env->gen = next;
  }
  env->write_mu.unlock();
  delete t->overlay;
  delete t;
  return 0;
}

// Compaction: rewrite the log with only live entries (atomic rename).
int hny_compact(Env* env) {
  std::lock_guard<std::mutex> g(env->write_mu);
  GenPtr gen;
  {
    std::lock_guard<std::mutex> s(env->swap_mu);
    gen = env->gen;
  }
  Overlay all;
  for (const auto& [name, table] : gen->tables) {
    auto& ov = all.tables[name];
    for (size_t i = 0; i < table.keys.size(); i++)
      ov[table.keys[i]] = {true, table.values[i]};
  }
  std::string batch = serialize_batch(all);
  std::string tmp = env->log_path + ".compact";
  FILE* f = fopen(tmp.c_str(), "wb");
  if (!f) return -2;
  if (fwrite(batch.data(), 1, batch.size(), f) != batch.size() ||
      fflush(f) != 0 || fsync(fileno(f)) != 0) {
    fclose(f);
    return -2;
  }
  fclose(f);
  fclose(env->log);
  // exclusivity is held by the sidecar lock fd throughout — the rename
  // window cannot admit a second writer
  if (rename(tmp.c_str(), env->log_path.c_str()) != 0) {
    env->log = fopen(env->log_path.c_str(), "ab");
    return env->log ? -2 : -3;
  }
  env->log = fopen(env->log_path.c_str(), "ab");
  return env->log ? 0 : -3;
}

// Bulk item staging (hot path for graph loads): scans [lo, hi) and copies
// each value's bytes after skipping `skip` header bytes into out (row-major,
// fixed row_bytes per value; shorter values zero-pad). Fills out_keys with
// the u64 keys. Returns rows written, or -3 if a row exceeds row_bytes.
int64_t hny_bulk_rows(Txn* t, const char* name, uint64_t lo, uint64_t hi,
                      uint32_t skip, uint8_t* out, uint64_t row_bytes,
                      uint64_t* out_keys, int64_t cap) {
  auto gt = t->gen->tables.find(name);
  if (gt == t->gen->tables.end()) return 0;
  const Table& table = gt->second;
  auto a = std::lower_bound(table.keys.begin(), table.keys.end(), lo);
  auto b = std::lower_bound(table.keys.begin(), table.keys.end(), hi);
  int64_t n = 0;
  for (auto it = a; it != b && n < cap; ++it, ++n) {
    size_t idx = it - table.keys.begin();
    const std::string& v = table.values[idx];
    size_t len = v.size() > skip ? v.size() - skip : 0;
    if (len > row_bytes) return -3;
    memcpy(out + n * row_bytes, v.data() + skip, len);
    if (len < row_bytes) memset(out + n * row_bytes + len, 0, row_bytes - len);
    out_keys[n] = *it;
  }
  return n;
}

}  // extern "C"
