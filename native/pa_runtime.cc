// TPU-native auction runtime: bulletin board + trackers (C++ core).
//
// Native equivalent of the reference's C++ runtime layer around the crypto
// compute path: the in-memory BulletinBoard message hub
// (/root/reference/SEAL/bulletinBoard.cpp:6-288,
//  /root/reference/CCS22/bulletinBoard.cpp:11-224) and the mutex-guarded
// Time/Data tracker singletons (/root/reference/include/timeTracker.h:10-77,
// include/dataTracker.h:8-53).
//
// The TPU compute path (field/EC/NIZK kernels) lives in JAX/XLA; this
// library owns the *runtime around it*: message storage with framing,
// per-category byte metering of every post/fetch, and monotonic
// per-category timers.  Exposed as a C ABI for ctypes binding
// (privacy_auction_tpu/runtime/native.py).
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <chrono>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

struct Message {
  std::vector<uint8_t> payload;
};

// Key: (phase, round, party).  Phase ids are protocol-defined small ints
// (commit=0, round1=1, round2=2, round3=3, ot_r1=4, ot_s=5, announce=6).
struct Board {
  std::mutex mu;
  int64_t n_parties = 0;
  std::map<std::tuple<int32_t, int32_t, int64_t>, Message> messages;
  std::map<std::string, int64_t> bytes;            // per-category meter
  std::map<std::string, double> times;             // per-category seconds
  std::map<std::string, Clock::time_point> open;   // running timers
};

int64_t &bytes_slot(Board *b, const char *category) {
  return b->bytes[std::string(category)];
}

}  // namespace

extern "C" {

Board *pa_board_new(int64_t n_parties) {
  Board *b = new Board();
  b->n_parties = n_parties;
  return b;
}

void pa_board_free(Board *b) { delete b; }

int64_t pa_board_n_parties(Board *b) {
  std::lock_guard<std::mutex> lock(b->mu);
  return b->n_parties;
}

// Post a message blob; meters `len` bytes to `category` (upload side),
// mirroring the add* paths of the reference board
// (SEAL/bulletinBoard.cpp:26-48).  Returns 0 on success.
int32_t pa_board_post(Board *b, int32_t phase, int32_t round, int64_t party,
                      const uint8_t *data, int64_t len, const char *category) {
  if (party < 0 || len < 0) return -1;
  std::lock_guard<std::mutex> lock(b->mu);
  Message &m = b->messages[{phase, round, party}];
  m.payload.assign(data, data + len);
  bytes_slot(b, category) += len;
  return 0;
}

// Size query so callers can allocate before fetching (-1 if absent).
int64_t pa_board_size(Board *b, int32_t phase, int32_t round, int64_t party) {
  std::lock_guard<std::mutex> lock(b->mu);
  auto it = b->messages.find({phase, round, party});
  if (it == b->messages.end()) return -1;
  return static_cast<int64_t>(it->second.payload.size());
}

// Fetch a message into caller-owned memory; meters the download to
// `category` (the get* paths, SEAL/bulletinBoard.cpp:71-132).  Returns
// bytes written, or -1 if absent / -2 if cap too small.
int64_t pa_board_fetch(Board *b, int32_t phase, int32_t round, int64_t party,
                       uint8_t *out, int64_t cap, const char *category) {
  std::lock_guard<std::mutex> lock(b->mu);
  auto it = b->messages.find({phase, round, party});
  if (it == b->messages.end()) return -1;
  const auto &p = it->second.payload;
  if (static_cast<int64_t>(p.size()) > cap) return -2;
  std::memcpy(out, p.data(), p.size());
  bytes_slot(b, category) += static_cast<int64_t>(p.size());
  return static_cast<int64_t>(p.size());
}

// Byte-count a transfer without storing (analytic metering path).
void pa_board_account(Board *b, const char *category, int64_t nbytes) {
  std::lock_guard<std::mutex> lock(b->mu);
  bytes_slot(b, category) += nbytes;
}

int64_t pa_board_bytes(Board *b, const char *category) {
  std::lock_guard<std::mutex> lock(b->mu);
  return bytes_slot(b, category);
}

int64_t pa_board_total_bytes(Board *b) {
  std::lock_guard<std::mutex> lock(b->mu);
  int64_t total = 0;
  for (const auto &kv : b->bytes) total += kv.second;
  return total;
}

// ---- timers (timeTracker.h:12-55 equivalents) ----------------------------

void pa_timer_start(Board *b, const char *category) {
  std::lock_guard<std::mutex> lock(b->mu);
  b->open[std::string(category)] = Clock::now();
}

void pa_timer_stop(Board *b, const char *category) {
  std::lock_guard<std::mutex> lock(b->mu);
  auto it = b->open.find(std::string(category));
  if (it == b->open.end()) return;
  double secs = std::chrono::duration<double>(Clock::now() - it->second).count();
  b->times[std::string(category)] += secs;
  b->open.erase(it);
}

double pa_timer_seconds(Board *b, const char *category) {
  std::lock_guard<std::mutex> lock(b->mu);
  auto it = b->times.find(std::string(category));
  return it == b->times.end() ? 0.0 : it->second;
}

void pa_board_reset(Board *b) {
  std::lock_guard<std::mutex> lock(b->mu);
  b->messages.clear();
  b->bytes.clear();
  b->times.clear();
  b->open.clear();
}

}  // extern "C"
