// FUSE transport — speaks the raw /dev/fuse kernel protocol directly.
//
// The reference binds to libfuse (fuse_main, folve-main.cc:539); this
// image has no libfuse development headers, so this implements the
// kernel protocol (<linux/fuse.h>, negotiated 7.x) from scratch:
// request loop, INIT negotiation, inode/path tables, directory
// enumeration framing, and direct-IO opens (the reference's short-read
// contract, folve-main.cc:214-234).  Filesystem semantics live in
// Python (folve_tpu.server.vfs); this layer calls back through a C ABI
// vtable.  The session can run against a socketpair for tests — the
// protocol is just reads and writes on a file descriptor.

#include <errno.h>
#include <fcntl.h>

#include <algorithm>
#include <linux/fuse.h>
#include <poll.h>
#include <stdio.h>
#include <string.h>
#include <sys/mount.h>
#include <sys/stat.h>
#include <sys/uio.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct FolveAttr {
  uint64_t size;
  uint32_t mode;
  uint32_t nlink;
  uint32_t uid;
  uint32_t gid;
  uint64_t mtime;
  uint64_t atime;
  uint64_t ctime;
};

struct FolveFuseOps {
  // fh != 0: stat the OPEN handler (exact sizes); 0: by path.
  int (*getattr)(const char* path, uint64_t fh, FolveAttr* out);
  int (*readdir)(const char* path, void* ctx);
  int (*readlink)(const char* path, char* buf, uint32_t bufsize);
  int (*open_)(const char* path, uint64_t* fh_out);
  int64_t (*read_)(uint64_t fh, char* buf, uint32_t size, uint64_t offset);
  int (*release_)(const char* path, uint64_t fh);
};

struct DirBuffer {
  std::vector<uint8_t> data;
};

class Session {
 public:
  explicit Session(const FolveFuseOps& ops) : ops_(ops) {
    paths_[FUSE_ROOT_ID] = "/";
    ino_by_path_["/"] = FUSE_ROOT_ID;
  }

  ~Session() {
    if (fd_ >= 0) close(fd_);
  }

  // extra_data: kernel fuse options appended verbatim to the mount data
  // string (e.g. "allow_other", "default_permissions"); writable != 0
  // clears the default MS_RDONLY.  The reference forwards such options
  // to libfuse via -o (folve-main.cc:499-512).
  int Mount(const char* mountpoint, const char* extra_data, int writable,
            const char* fsname = nullptr, const char* subtype = nullptr,
            unsigned max_read = 0) {
    fd_ = open("/dev/fuse", O_RDWR | O_CLOEXEC);
    if (fd_ < 0) return -errno;
    struct stat st;
    if (stat(mountpoint, &st) != 0) {
      int err = -errno;
      close(fd_);
      fd_ = -1;
      return err;
    }
    char data[512];
    snprintf(data, sizeof(data),
             "fd=%d,rootmode=%o,user_id=%u,group_id=%u,max_read=%u%s%s",
             fd_, st.st_mode & S_IFMT, getuid(), getgid(),
             max_read ? max_read : 131072u,
             (extra_data && extra_data[0]) ? "," : "",
             extra_data ? extra_data : "");
    // -o fsname= names the mount source; -o subtype= the fs type shown
    // in the mount table (the reference forwards both to libfuse,
    // folve-main.cc:499-514).
    char type[128];
    snprintf(type, sizeof(type), "fuse.%s",
             (subtype && subtype[0]) ? subtype : "folve-tpu");
    const char* src = (fsname && fsname[0]) ? fsname : "folve-tpu";
    unsigned long flags = MS_NOSUID | MS_NODEV;
    writable_ = writable != 0;
    if (!writable) flags |= MS_RDONLY;
    if (mount(src, mountpoint, type, flags, data) != 0) {
      int err = -errno;
      close(fd_);
      fd_ = -1;
      return err;
    }
    mountpoint_ = mountpoint;
    return 0;
  }

  void SetFd(int fd) { fd_ = fd; }

  void Unmount() {
    if (!mountpoint_.empty()) {
      umount2(mountpoint_.c_str(), MNT_DETACH);
      mountpoint_.clear();
    }
    exiting_ = true;
  }

  int Loop(int num_threads) {
    if (fd_ < 0) return -EBADF;
    std::vector<std::thread> workers;
    for (int i = 1; i < num_threads; i++) {
      workers.emplace_back([this] { WorkerLoop(); });
    }
    WorkerLoop();
    for (auto& t : workers) t.join();
    return 0;
  }

  bool exiting() const { return exiting_; }

 private:
  void WorkerLoop() {
    std::vector<uint8_t> buf(FUSE_MIN_READ_BUFFER + 256 * 1024);
    while (!exiting_) {
      ssize_t n = read(fd_, buf.data(), buf.size());
      if (n < 0) {
        if (errno == EINTR || errno == EAGAIN) continue;
        break;  // ENODEV: unmounted
      }
      if ((size_t)n < sizeof(fuse_in_header)) continue;
      Dispatch(buf.data(), (size_t)n);
    }
    exiting_ = true;
  }

  // ---- reply helpers ----------------------------------------------------

  void Reply(uint64_t unique, int error, const void* payload, size_t len) {
    fuse_out_header out;
    out.len = (uint32_t)(sizeof(out) + len);
    out.error = error;
    out.unique = unique;
    struct iovec iov[2] = {{&out, sizeof(out)}, {(void*)payload, len}};
    ssize_t r = writev(fd_, iov, payload ? 2 : 1);
    (void)r;
  }

  void ReplyErr(uint64_t unique, int err) { Reply(unique, -err, nullptr, 0); }

  static void FillAttr(const FolveAttr& a, uint64_t ino, fuse_attr* out) {
    memset(out, 0, sizeof(*out));
    out->ino = ino;
    out->size = a.size;
    out->blocks = (a.size + 511) / 512;
    out->atime = a.atime;
    out->mtime = a.mtime;
    out->ctime = a.ctime;
    out->mode = a.mode;
    out->nlink = a.nlink ? a.nlink : 1;
    out->uid = a.uid;
    out->gid = a.gid;
    out->blksize = 4096;
  }

  // ---- inode table ------------------------------------------------------

  std::string PathOf(uint64_t ino) {
    std::lock_guard<std::mutex> l(mu_);
    auto it = paths_.find(ino);
    return it == paths_.end() ? std::string() : it->second;
  }

  uint64_t InternPath(const std::string& path) {
    std::lock_guard<std::mutex> l(mu_);
    auto it = ino_by_path_.find(path);
    if (it != ino_by_path_.end()) return it->second;
    uint64_t ino = next_ino_++;
    ino_by_path_[path] = ino;
    paths_[ino] = path;
    return ino;
  }

  static std::string JoinPath(const std::string& dir, const char* name) {
    if (dir == "/") return "/" + std::string(name);
    return dir + "/" + name;
  }

  // ---- dispatch ---------------------------------------------------------

  void Dispatch(const uint8_t* msg, size_t len) {
    // Defensive: a runt message (possible on the test socketpair
    // transport) must not be parsed past its end.
    if (len < sizeof(fuse_in_header)) return;
    const fuse_in_header* in = (const fuse_in_header*)msg;
    if (in->len > len) return;
    const uint8_t* arg = msg + sizeof(fuse_in_header);
    switch (in->opcode) {
      case FUSE_INIT:
        DoInit(in, (const fuse_init_in*)arg);
        break;
      case FUSE_LOOKUP:
        DoLookup(in, (const char*)arg);
        break;
      case FUSE_FORGET:
      case FUSE_BATCH_FORGET:
        break;  // no reply, nothing freed (table is bounded by namespace)
      case FUSE_GETATTR:
        DoGetattr(in, arg, std::min((size_t)in->len, len) - sizeof(fuse_in_header));
        break;
      case FUSE_READLINK:
        DoReadlink(in);
        break;
      case FUSE_OPENDIR:
        DoOpendir(in);
        break;
      case FUSE_READDIR:
        DoReaddir(in, (const fuse_read_in*)arg);
        break;
      case FUSE_RELEASEDIR:
        DoReleasedir(in, (const fuse_release_in*)arg);
        break;
      case FUSE_OPEN:
        DoOpen(in, arg, std::min((size_t)in->len, len) - sizeof(fuse_in_header));
        break;
      case FUSE_READ:
        DoRead(in, (const fuse_read_in*)arg);
        break;
      case FUSE_RELEASE:
        DoRelease(in, (const fuse_release_in*)arg);
        break;
      case FUSE_FLUSH:
      case FUSE_ACCESS:
        Reply(in->unique, 0, nullptr, 0);
        break;
      case FUSE_STATFS: {
        fuse_statfs_out out;
        memset(&out, 0, sizeof(out));
        out.st.namelen = 255;
        out.st.bsize = 4096;
        Reply(in->unique, 0, &out, sizeof(out));
        break;
      }
      case FUSE_DESTROY:
        exiting_ = true;
        Reply(in->unique, 0, nullptr, 0);
        break;
      case FUSE_INTERRUPT:
        break;  // no reply
      default:
        ReplyErr(in->unique, ENOSYS);
    }
  }

  void DoInit(const fuse_in_header* in, const fuse_init_in* init) {
    fuse_init_out out;
    memset(&out, 0, sizeof(out));
    out.major = FUSE_KERNEL_VERSION;
    out.minor = init->minor < FUSE_KERNEL_MINOR_VERSION
                    ? init->minor
                    : FUSE_KERNEL_MINOR_VERSION;
    out.max_readahead = init->max_readahead;
    out.flags = init->flags & (FUSE_ASYNC_READ | FUSE_BIG_WRITES);
    out.max_write = 128 * 1024;
    out.max_background = 16;
    out.congestion_threshold = 12;
    // Older kernels expect the short (v7.5) layout.
    size_t size = init->major == 7 && init->minor < 5
                      ? FUSE_COMPAT_INIT_OUT_SIZE
                      : sizeof(out);
    Reply(in->unique, 0, &out, size);
  }

  void DoLookup(const fuse_in_header* in, const char* name) {
    std::string dir = PathOf(in->nodeid);
    if (dir.empty()) return ReplyErr(in->unique, ENOENT);
    std::string path = JoinPath(dir, name);
    FolveAttr attr;
    int r = ops_.getattr(path.c_str(), 0, &attr);
    if (r != 0) return ReplyErr(in->unique, -r);
    fuse_entry_out out;
    memset(&out, 0, sizeof(out));
    out.nodeid = InternPath(path);
    out.generation = 1;
    out.entry_valid = 1;
    out.attr_valid = 1;  // seconds; size estimates refresh on re-stat
    FillAttr(attr, out.nodeid, &out.attr);
    Reply(in->unique, 0, &out, sizeof(out));
  }

  void DoGetattr(const fuse_in_header* in, const void* arg, size_t arglen) {
    std::string path = PathOf(in->nodeid);
    if (path.empty()) return ReplyErr(in->unique, ENOENT);
    // fstat() on an open file carries the handle (proto >= 7.9): stat
    // the live handler so sizes are exact, not the path-based estimate
    // (the reference's per-open-handler Stat, folve-main.cc:114-153).
    uint64_t fh = 0;
    if (arglen >= sizeof(fuse_getattr_in)) {
      const fuse_getattr_in* gi = (const fuse_getattr_in*)arg;
      if (gi->getattr_flags & FUSE_GETATTR_FH) fh = gi->fh;
    }
    FolveAttr attr;
    int r = ops_.getattr(path.c_str(), fh, &attr);
    if (r != 0) return ReplyErr(in->unique, -r);
    fuse_attr_out out;
    memset(&out, 0, sizeof(out));
    out.attr_valid = 1;
    FillAttr(attr, in->nodeid, &out.attr);
    Reply(in->unique, 0, &out, sizeof(out));
  }

  void DoReadlink(const fuse_in_header* in) {
    std::string path = PathOf(in->nodeid);
    if (path.empty()) return ReplyErr(in->unique, ENOENT);
    char buf[4096];
    int r = ops_.readlink(path.c_str(), buf, sizeof(buf) - 1);
    if (r < 0) return ReplyErr(in->unique, -r);
    // r is the target length (the callback contract); never trust the
    // buffer to be initialized beyond it.
    if ((size_t)r > sizeof(buf) - 1) return ReplyErr(in->unique, EIO);
    Reply(in->unique, 0, buf, (size_t)r);
  }

  void DoOpendir(const fuse_in_header* in) {
    std::string path = PathOf(in->nodeid);
    if (path.empty()) return ReplyErr(in->unique, ENOENT);
    auto dirbuf = std::make_shared<DirBuffer>();
    int r = ops_.readdir(path.c_str(), dirbuf.get());
    if (r != 0) return ReplyErr(in->unique, -r);
    uint64_t fh;
    {
      std::lock_guard<std::mutex> l(mu_);
      fh = next_dir_fh_++;
      dirs_[fh] = dirbuf;
    }
    fuse_open_out out;
    memset(&out, 0, sizeof(out));
    out.fh = fh;
    Reply(in->unique, 0, &out, sizeof(out));
  }

  void DoReaddir(const fuse_in_header* in, const fuse_read_in* rd) {
    std::shared_ptr<DirBuffer> dirbuf;
    {
      std::lock_guard<std::mutex> l(mu_);
      auto it = dirs_.find(rd->fh);
      if (it == dirs_.end()) return ReplyErr(in->unique, EBADF);
      dirbuf = it->second;
    }
    size_t total = dirbuf->data.size();
    if (rd->offset >= total) return Reply(in->unique, 0, nullptr, 0);
    size_t n = total - rd->offset;
    if (n > rd->size) {
      // Truncate at a dirent boundary: scan forward from offset.
      size_t pos = 0, lastfit = 0;
      const uint8_t* base = dirbuf->data.data() + rd->offset;
      while (pos < n) {
        const fuse_dirent* de = (const fuse_dirent*)(base + pos);
        size_t entlen = FUSE_DIRENT_ALIGN(sizeof(fuse_dirent) + de->namelen);
        if (pos + entlen > rd->size) break;
        pos += entlen;
        lastfit = pos;
      }
      n = lastfit;
    }
    Reply(in->unique, 0, dirbuf->data.data() + rd->offset, n);
  }

  void DoReleasedir(const fuse_in_header* in, const fuse_release_in* rl) {
    {
      std::lock_guard<std::mutex> l(mu_);
      dirs_.erase(rl->fh);  // last shared_ptr owner frees the buffer
    }
    Reply(in->unique, 0, nullptr, 0);
  }

  void DoOpen(const fuse_in_header* in, const void* arg, size_t arglen) {
    std::string path = PathOf(in->nodeid);
    if (path.empty()) return ReplyErr(in->unique, ENOENT);
    // The filesystem is read-only by design (the reference never
    // supports writes); failing write-access opens up front beats a
    // confusing ENOSYS at the first FUSE_WRITE.  An explicit `-o rw`
    // mount opts back into the reference's deferred-ENOSYS behavior.
    if (!writable_ && arglen >= sizeof(fuse_open_in)) {
      const fuse_open_in* oi = (const fuse_open_in*)arg;
      if ((oi->flags & O_ACCMODE) != O_RDONLY)
        return ReplyErr(in->unique, EROFS);
    }
    uint64_t fh = 0;
    int r = ops_.open_(path.c_str(), &fh);
    if (r != 0) return ReplyErr(in->unique, -r);
    {
      std::lock_guard<std::mutex> l(mu_);
      open_paths_[fh] = path;
    }
    fuse_open_out out;
    memset(&out, 0, sizeof(out));
    out.fh = fh;
    // Allow short reads: metadata indexing must not start the convolver
    // (the reference's direct_io, folve-main.cc:224).
    out.open_flags = FOPEN_DIRECT_IO;
    Reply(in->unique, 0, &out, sizeof(out));
  }

  void DoRead(const fuse_in_header* in, const fuse_read_in* rd) {
    std::vector<char> buf(rd->size);
    int64_t r = ops_.read_(rd->fh, buf.data(), rd->size, rd->offset);
    if (r < 0) return ReplyErr(in->unique, (int)-r);
    Reply(in->unique, 0, buf.data(), (size_t)r);
  }

  void DoRelease(const fuse_in_header* in, const fuse_release_in* rl) {
    std::string path;
    {
      std::lock_guard<std::mutex> l(mu_);
      auto it = open_paths_.find(rl->fh);
      if (it != open_paths_.end()) {
        path = it->second;
        open_paths_.erase(it);
      }
    }
    if (!path.empty()) ops_.release_(path.c_str(), rl->fh);
    Reply(in->unique, 0, nullptr, 0);
  }

  FolveFuseOps ops_;
  int fd_ = -1;
  std::string mountpoint_;
  std::atomic<bool> exiting_{false};
  std::mutex mu_;
  std::map<uint64_t, std::string> paths_;
  std::map<std::string, uint64_t> ino_by_path_;
  // shared_ptr: DoReaddir replies outside the lock, so a concurrent
  // RELEASEDIR must not free the buffer under it (TSAN-found race).
  std::map<uint64_t, std::shared_ptr<DirBuffer>> dirs_;
  std::map<uint64_t, std::string> open_paths_;
  uint64_t next_ino_ = FUSE_ROOT_ID + 1;
  bool writable_ = false;
  uint64_t next_dir_fh_ = 1;
};

}  // namespace

extern "C" {

void* folve_fuse_session_new(const FolveFuseOps* ops) {
  return new Session(*ops);
}

int folve_fuse_session_mount(void* s, const char* mountpoint) {
  return ((Session*)s)->Mount(mountpoint, nullptr, 0);
}

int folve_fuse_session_mount_opts2(void* s, const char* mountpoint,
                                   const char* extra_data, int writable,
                                   const char* fsname, const char* subtype,
                                   unsigned max_read) {
  return ((Session*)s)->Mount(mountpoint, extra_data, writable, fsname,
                              subtype, max_read);
}

int folve_fuse_session_mount_opts(void* s, const char* mountpoint,
                                  const char* extra_data, int writable) {
  return ((Session*)s)->Mount(mountpoint, extra_data, writable);
}

void folve_fuse_session_set_fd(void* s, int fd) { ((Session*)s)->SetFd(fd); }

int folve_fuse_session_loop(void* s, int num_threads) {
  return ((Session*)s)->Loop(num_threads);
}

void folve_fuse_session_unmount(void* s) { ((Session*)s)->Unmount(); }

void folve_fuse_session_destroy(void* s) { delete (Session*)s; }

// Called from the Python readdir callback for each entry.
void folve_fuse_add_dirent(void* ctx, const char* name, uint64_t ino,
                           uint32_t dtype) {
  DirBuffer* buf = (DirBuffer*)ctx;
  size_t namelen = strlen(name);
  size_t entlen = FUSE_DIRENT_ALIGN(sizeof(fuse_dirent) + namelen);
  size_t pos = buf->data.size();
  buf->data.resize(pos + entlen, 0);
  fuse_dirent* de = (fuse_dirent*)(buf->data.data() + pos);
  de->ino = ino ? ino : 0xffffffff;
  de->off = pos + entlen;  // offset of the *next* entry
  de->namelen = (uint32_t)namelen;
  de->type = dtype;
  memcpy(de->name, name, namelen);
}

}  // extern "C"
