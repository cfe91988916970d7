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
#include <thread>
#include <vector>

#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

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

// ---------------------------------------------------------------------------
// Multi-process deployment hub: the board served over a Unix-domain socket.
//
// The reference "network" is an in-process object the driver passes around
// (SEAL/main.cpp:30, CCS22/main.cpp:31); real deployments need a process
// boundary.  A BoardServer owns a Board and serves post/fetch/meter
// requests from party processes over a length-framed socket protocol; the
// byte meters then count real cross-process transfers, not simulations.
//
// Wire format (native-endian, same-host processes):
//   request:  u8 op | i32 phase | i32 round | i64 party
//             | u32 cat_len | u32 payload_len | cat | payload
//   response: i64 status | u32 payload_len | payload
// Ops: 1=POST 2=FETCH 3=BYTES 4=TOTAL 5=RESET 6=ACCOUNT(nbytes in party).
// ---------------------------------------------------------------------------

namespace {

bool read_full(int fd, void *buf, size_t len) {
  uint8_t *p = static_cast<uint8_t *>(buf);
  while (len) {
    ssize_t r = ::read(fd, p, len);
    if (r <= 0) return false;
    p += r;
    len -= static_cast<size_t>(r);
  }
  return true;
}

bool write_full(int fd, const void *buf, size_t len) {
  const uint8_t *p = static_cast<const uint8_t *>(buf);
  while (len) {
    ssize_t w = ::write(fd, p, len);
    if (w <= 0) return false;
    p += w;
    len -= static_cast<size_t>(w);
  }
  return true;
}

#pragma pack(push, 1)
struct ReqHeader {
  uint8_t op;
  int32_t phase;
  int32_t round;
  int64_t party;
  uint32_t cat_len;
  uint32_t payload_len;
};
struct RespHeader {
  int64_t status;
  uint32_t payload_len;
};
#pragma pack(pop)

struct Server {
  Board *board = nullptr;
  int listen_fd = -1;
  std::thread accept_thread;
  std::string path;
  // Live connection bookkeeping so pa_server_stop can shut down and JOIN
  // every per-connection thread before the caller frees the Board (a
  // detached straggler -- e.g. a crashed party holding its socket open --
  // would otherwise race pa_board_free into a use-after-free).
  std::mutex conn_mu;
  std::vector<int> conn_fds;
  std::vector<std::thread> conn_threads;
  bool stopping = false;
};

// Size + copy under ONE board lock (a concurrent overwrite-post between a
// separate size query and fetch could otherwise grow the message and turn
// the fetch into a spurious -2).  Meters the download like pa_board_fetch.
int64_t board_fetch_copy(Board *b, int32_t phase, int32_t round, int64_t party,
                         std::vector<uint8_t> &out, const char *category) {
  std::lock_guard<std::mutex> lock(b->mu);
  auto it = b->messages.find({phase, round, party});
  if (it == b->messages.end()) return -1;
  const auto &p = it->second.payload;
  out.assign(p.begin(), p.end());
  bytes_slot(b, category) += static_cast<int64_t>(p.size());
  return static_cast<int64_t>(p.size());
}

void serve_conn(Board *board, int fd) {
  std::vector<uint8_t> cat, payload, out;
  for (;;) {
    ReqHeader h;
    if (!read_full(fd, &h, sizeof(h))) break;
    if (h.cat_len > 256 || h.payload_len > (64u << 20)) break;
    cat.resize(h.cat_len + 1);
    cat[h.cat_len] = 0;
    if (h.cat_len && !read_full(fd, cat.data(), h.cat_len)) break;
    payload.resize(h.payload_len);
    if (h.payload_len && !read_full(fd, payload.data(), h.payload_len)) break;
    const char *category = reinterpret_cast<const char *>(cat.data());

    RespHeader resp{0, 0};
    out.clear();
    switch (h.op) {
      case 1:  // POST
        resp.status = pa_board_post(board, h.phase, h.round, h.party,
                                    payload.data(),
                                    static_cast<int64_t>(payload.size()),
                                    category);
        break;
      case 2: {  // FETCH (atomic size+copy under one board lock)
        resp.status =
            board_fetch_copy(board, h.phase, h.round, h.party, out, category);
        if (resp.status >= 0)
          resp.payload_len = static_cast<uint32_t>(resp.status);
        else
          out.clear();
        break;
      }
      case 3:  // BYTES
        resp.status = pa_board_bytes(board, category);
        break;
      case 4:  // TOTAL
        resp.status = pa_board_total_bytes(board);
        break;
      case 5:  // RESET
        pa_board_reset(board);
        break;
      case 6:  // ACCOUNT (nbytes carried in the party field)
        pa_board_account(board, category, h.party);
        break;
      default:
        resp.status = -99;
        break;
    }
    if (!write_full(fd, &resp, sizeof(resp))) break;
    if (resp.payload_len && !write_full(fd, out.data(), resp.payload_len))
      break;
  }
  ::close(fd);
}

}  // namespace

extern "C" {

// Start serving `board` on a Unix-domain socket at `path` (unlinked first).
// Returns an opaque server handle, or null on failure.
Server *pa_server_start(Board *board, const char *path) {
  int fd = ::socket(AF_UNIX, SOCK_STREAM, 0);
  if (fd < 0) return nullptr;
  sockaddr_un addr{};
  addr.sun_family = AF_UNIX;
  std::strncpy(addr.sun_path, path, sizeof(addr.sun_path) - 1);
  ::unlink(path);
  if (::bind(fd, reinterpret_cast<sockaddr *>(&addr), sizeof(addr)) < 0 ||
      ::listen(fd, 64) < 0) {
    ::close(fd);
    return nullptr;
  }
  Server *s = new Server();
  s->board = board;
  s->listen_fd = fd;
  s->path = path;
  s->accept_thread = std::thread([s]() {
    for (;;) {
      int conn = ::accept(s->listen_fd, nullptr, nullptr);
      if (conn < 0) break;  // listen fd closed: shut down
      std::lock_guard<std::mutex> lock(s->conn_mu);
      if (s->stopping) {
        ::close(conn);
        break;
      }
      s->conn_fds.push_back(conn);
      s->conn_threads.emplace_back(serve_conn, s->board, conn);
    }
  });
  return s;
}

void pa_server_stop(Server *s) {
  if (!s) return;
  ::shutdown(s->listen_fd, SHUT_RDWR);
  ::close(s->listen_fd);
  if (s->accept_thread.joinable()) s->accept_thread.join();
  {
    // Wake every in-flight connection (their reads fail and the serve
    // loops exit; serve_conn owns the close) ...
    std::lock_guard<std::mutex> lock(s->conn_mu);
    s->stopping = true;
    for (int fd : s->conn_fds) ::shutdown(fd, SHUT_RDWR);
  }
  // ... then JOIN them all: after this returns no thread can touch the
  // Board, so the caller may safely pa_board_free it.
  for (auto &t : s->conn_threads)
    if (t.joinable()) t.join();
  ::unlink(s->path.c_str());
  delete s;
}

// ---- client side ----------------------------------------------------------

struct PaClient {
  int fd = -1;
  std::mutex mu;
};

PaClient *pa_client_connect(const char *path) {
  int fd = ::socket(AF_UNIX, SOCK_STREAM, 0);
  if (fd < 0) return nullptr;
  sockaddr_un addr{};
  addr.sun_family = AF_UNIX;
  std::strncpy(addr.sun_path, path, sizeof(addr.sun_path) - 1);
  if (::connect(fd, reinterpret_cast<sockaddr *>(&addr), sizeof(addr)) < 0) {
    ::close(fd);
    return nullptr;
  }
  PaClient *c = new PaClient();
  c->fd = fd;
  return c;
}

void pa_client_close(PaClient *c) {
  if (!c) return;
  ::close(c->fd);
  delete c;
}

static int64_t client_call(PaClient *c, uint8_t op, int32_t phase,
                           int32_t round, int64_t party, const uint8_t *data,
                           int64_t len, const char *category, uint8_t *out,
                           int64_t cap) {
  std::lock_guard<std::mutex> lock(c->mu);
  ReqHeader h{};
  h.op = op;
  h.phase = phase;
  h.round = round;
  h.party = party;
  size_t cat_len = category ? std::strlen(category) : 0;
  h.cat_len = static_cast<uint32_t>(cat_len);
  h.payload_len = static_cast<uint32_t>(len > 0 ? len : 0);
  if (!write_full(c->fd, &h, sizeof(h))) return -3;
  if (cat_len && !write_full(c->fd, category, cat_len)) return -3;
  if (h.payload_len && !write_full(c->fd, data, h.payload_len)) return -3;
  RespHeader r;
  if (!read_full(c->fd, &r, sizeof(r))) return -3;
  if (r.payload_len) {
    if (out == nullptr || static_cast<int64_t>(r.payload_len) > cap) {
      // drain and report truncation
      std::vector<uint8_t> sink(r.payload_len);
      read_full(c->fd, sink.data(), r.payload_len);
      return -2;
    }
    if (!read_full(c->fd, out, r.payload_len)) return -3;
  }
  return r.status;
}

int32_t pa_client_post(PaClient *c, int32_t phase, int32_t round,
                       int64_t party, const uint8_t *data, int64_t len,
                       const char *category) {
  return static_cast<int32_t>(
      client_call(c, 1, phase, round, party, data, len, category, nullptr, 0));
}

int64_t pa_client_fetch(PaClient *c, int32_t phase, int32_t round,
                        int64_t party, uint8_t *out, int64_t cap,
                        const char *category) {
  return client_call(c, 2, phase, round, party, nullptr, 0, category, out, cap);
}

int64_t pa_client_bytes(PaClient *c, const char *category) {
  return client_call(c, 3, 0, 0, 0, nullptr, 0, category, nullptr, 0);
}

int64_t pa_client_total_bytes(PaClient *c) {
  return client_call(c, 4, 0, 0, 0, nullptr, 0, "", nullptr, 0);
}

void pa_client_reset(PaClient *c) {
  client_call(c, 5, 0, 0, 0, nullptr, 0, "", nullptr, 0);
}

void pa_client_account(PaClient *c, const char *category, int64_t nbytes) {
  client_call(c, 6, 0, 0, nbytes, nullptr, 0, category, nullptr, 0);
}

}  // extern "C"
