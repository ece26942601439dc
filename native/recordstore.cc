// tsrstore — a tiny native key/value record store for training data.
//
// Plays the role LMDB plays in the reference pipeline (imagereader.py:120,
// build_lmdb.py:136): an on-disk, memory-mapped, read-mostly map from string
// keys to serialized ImageMaskPair protobufs. Design goals, in order:
//   1. zero-copy reads: value lookups return pointers straight into the mmap,
//      so N reader processes share one page-cache copy of the dataset;
//   2. sorted-key iteration (LMDB cursor semantics) so the reference's
//      deterministic worker-strided key walk (imagereader.py:239-241) is
//      reproducible;
//   3. dead-simple append-only writes — the builder is a batch job.
//
// File layout (single file `data.tsr` inside the database directory):
//   [0..8)   magic "TSRSTOR1"
//   [8..16)  u64 record_count   (little endian, patched on close)
//   [16..24) u64 index_offset   (patched on close)
//   records: repeated { u32 key_len; u64 val_len; key bytes; val bytes }
//   index at index_offset, sorted by key:
//            repeated { u32 key_len; u64 val_offset; u64 val_len; key bytes }
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

// The on-disk integers are little-endian (the pure-Python twin uses "<"
// struct formats); this implementation writes host byte order, so refuse
// to build where the two would diverge.
static_assert(__BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__,
              "tsrstore's on-disk format is little-endian");

namespace {

constexpr char kMagic[8] = {'T', 'S', 'R', 'S', 'T', 'O', 'R', '1'};
constexpr uint64_t kHeaderSize = 24;

struct IndexEntry {
  std::string key;
  uint64_t offset;  // offset of the value bytes
  uint64_t length;
};

struct Writer {
  FILE* f = nullptr;
  std::vector<IndexEntry> index;
  uint64_t pos = kHeaderSize;
};

// Index entries view key bytes straight out of the mmap (no heap copies of
// the key space — goal #1, readers should share the page cache, extends to
// the index). by_key is built lazily on the first get(): the hot training
// path only ever calls get_at() by sorted position and never pays for it.
struct ReaderEntry {
  const char* key;
  uint32_t key_len;
  uint64_t offset;
  uint64_t length;
};

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;
  uint64_t size = 0;
  std::vector<ReaderEntry> index;  // sorted by key (writer's sort order)
  std::unordered_map<std::string_view, uint32_t> by_key;  // key -> slot
  std::once_flag by_key_once;  // ctypes releases the GIL around calls
};

}  // namespace

extern "C" {

void* tsr_writer_open(const char* path) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  uint8_t header[kHeaderSize] = {0};
  std::memcpy(header, kMagic, 8);
  if (std::fwrite(header, 1, kHeaderSize, f) != kHeaderSize) {
    std::fclose(f);
    return nullptr;
  }
  Writer* w = new Writer();
  w->f = f;
  return w;
}

int tsr_writer_put(void* handle, const char* key, uint32_t key_len,
                   const char* val, uint64_t val_len) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w || !w->f) return -1;
  uint32_t kl = key_len;
  uint64_t vl = val_len;
  if (std::fwrite(&kl, sizeof(kl), 1, w->f) != 1) return -1;
  if (std::fwrite(&vl, sizeof(vl), 1, w->f) != 1) return -1;
  if (key_len && std::fwrite(key, 1, key_len, w->f) != key_len) return -1;
  if (val_len && std::fwrite(val, 1, val_len, w->f) != val_len) return -1;
  uint64_t val_offset = w->pos + sizeof(kl) + sizeof(vl) + key_len;
  w->index.push_back({std::string(key, key_len), val_offset, val_len});
  w->pos = val_offset + val_len;
  return 0;
}

int tsr_writer_close(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  int rc = 0;
  if (w->f) {
    // stable sort + last-of-run: duplicate puts resolve to the latest value,
    // the overwrite semantics of the reference's LMDB txn.put
    // (build_lmdb.py:136) — and identical to the pure-Python writer
    std::stable_sort(w->index.begin(), w->index.end(),
                     [](const IndexEntry& a, const IndexEntry& b) { return a.key < b.key; });
    std::vector<IndexEntry> dedup;
    dedup.reserve(w->index.size());
    for (const IndexEntry& e : w->index) {
      if (!dedup.empty() && dedup.back().key == e.key) {
        dedup.back() = e;  // later put (file order within the run) wins
      } else {
        dedup.push_back(e);
      }
    }
    uint64_t index_offset = w->pos;
    for (const IndexEntry& e : dedup) {
      uint32_t kl = static_cast<uint32_t>(e.key.size());
      if (std::fwrite(&kl, sizeof(kl), 1, w->f) != 1 ||
          std::fwrite(&e.offset, sizeof(e.offset), 1, w->f) != 1 ||
          std::fwrite(&e.length, sizeof(e.length), 1, w->f) != 1 ||
          (kl && std::fwrite(e.key.data(), 1, kl, w->f) != kl)) {
        rc = -1;
        break;
      }
    }
    if (rc == 0) {
      uint64_t count = dedup.size();
      if (std::fseek(w->f, 8, SEEK_SET) != 0 ||
          std::fwrite(&count, sizeof(count), 1, w->f) != 1 ||
          std::fwrite(&index_offset, sizeof(index_offset), 1, w->f) != 1) {
        rc = -1;
      }
    }
    if (std::fclose(w->f) != 0) rc = -1;
  }
  delete w;
  return rc;
}

// Abandon the database WITHOUT finalizing: no index is written and the
// header keeps its zeroed count/index_offset, so any later open of the
// partial file fails the header sanity check instead of serving a
// valid-looking truncated dataset. Callers delete the file.
int tsr_writer_abort(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  int rc = 0;
  if (w->f && std::fclose(w->f) != 0) rc = -1;
  delete w;
  return rc;
}

void* tsr_reader_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<uint64_t>(st.st_size) < kHeaderSize) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const uint8_t* p = static_cast<const uint8_t*>(base);
  if (std::memcmp(p, kMagic, 8) != 0) {
    munmap(base, st.st_size);
    ::close(fd);
    return nullptr;
  }
  uint64_t count, index_offset;
  std::memcpy(&count, p + 8, 8);
  std::memcpy(&index_offset, p + 16, 8);

  // Header sanity against corruption: every index entry is >= 20 bytes, the
  // index must lie inside the file, and counts beyond what could possibly
  // fit mean garbage (a corrupt count used to reach vector::reserve, whose
  // std::length_error would escape the C ABI and terminate the process).
  const uint64_t size = static_cast<uint64_t>(st.st_size);
  if (index_offset < kHeaderSize || index_offset > size ||
      count > (size - index_offset) / 20) {
    munmap(base, st.st_size);
    ::close(fd);
    return nullptr;
  }

  Reader* r = new Reader();
  r->fd = fd;
  r->base = p;
  r->size = size;
  r->index.reserve(count);
  uint64_t pos = index_offset;
  for (uint64_t i = 0; i < count; ++i) {
    // overflow-safe bounds checks (pos + n could wrap for corrupt values)
    if (pos > r->size || r->size - pos < 20) {  // truncated index
      munmap(base, st.st_size);
      ::close(fd);
      delete r;
      return nullptr;
    }
    uint32_t kl;
    uint64_t off, len;
    std::memcpy(&kl, p + pos, 4);
    std::memcpy(&off, p + pos + 4, 8);
    std::memcpy(&len, p + pos + 12, 8);
    pos += 20;
    if (r->size - pos < kl ||
        off > r->size || r->size - off < len) {  // corrupt entry
      munmap(base, st.st_size);
      ::close(fd);
      delete r;
      return nullptr;
    }
    // key bytes stay in the mmap; no per-key heap allocation
    r->index.push_back({reinterpret_cast<const char*>(p + pos), kl, off, len});
    pos += kl;
  }
  return r;
}

namespace {

void build_by_key(Reader* r) {
  r->by_key.reserve(r->index.size());
  for (uint32_t i = 0; i < r->index.size(); ++i) {
    const ReaderEntry& e = r->index[i];
    // assignment, not emplace: on duplicate keys (foreign writers — ours
    // dedup at close) the later sorted slot wins, matching the pure-Python
    // reader's dict semantics and LMDB's overwrite behavior
    r->by_key[std::string_view(e.key, e.key_len)] = i;
  }
}

}  // namespace

uint64_t tsr_reader_count(void* handle) {
  Reader* r = static_cast<Reader*>(handle);
  return r ? r->index.size() : 0;
}

int tsr_reader_key(void* handle, uint64_t i, const char** key, uint32_t* key_len) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r || i >= r->index.size()) return -1;
  *key = r->index[i].key;
  *key_len = r->index[i].key_len;
  return 0;
}

int tsr_reader_get(void* handle, const char* key, uint32_t key_len,
                   const char** val, uint64_t* val_len) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r) return -1;
  std::call_once(r->by_key_once, build_by_key, r);
  auto it = r->by_key.find(std::string_view(key, key_len));
  if (it == r->by_key.end()) return -1;
  const ReaderEntry& e = r->index[it->second];
  if (e.offset > r->size || r->size - e.offset < e.length) return -1;
  *val = reinterpret_cast<const char*>(r->base + e.offset);
  *val_len = e.length;
  return 0;
}

// Value lookup by sorted position — lets readers stride the key space without
// materializing Python key strings at all.
int tsr_reader_get_at(void* handle, uint64_t i, const char** val, uint64_t* val_len) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r || i >= r->index.size()) return -1;
  const ReaderEntry& e = r->index[i];
  if (e.offset > r->size || r->size - e.offset < e.length) return -1;
  *val = reinterpret_cast<const char*>(r->base + e.offset);
  *val_len = e.length;
  return 0;
}

void tsr_reader_close(void* handle) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r) return;
  if (r->base) munmap(const_cast<uint8_t*>(r->base), r->size);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

}  // extern "C"
