// Shared frame-parallel worker pool for the native codecs.
#pragma once
#include <condition_variable>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace folve {

// Codec frames are independent units of work: FLAC frames encode and
// decode in isolation, Vorbis packets synthesize in isolation (only
// the overlap-add is sequential).  One call carrying several frames
// fans them across cores and joins before returning, so every codec
// API stays synchronous and its output identical to the serial path.
// One process-wide pool shared by all codecs; sized by
// folve_flac_enc_set_threads() (0 = auto: hardware_concurrency capped).
class FramePool {
 public:
  static FramePool& Instance() {
    // Intentionally leaked: joining workers from a static destructor
    // races interpreter/library teardown (Python atexit, dlclose
    // order).  Idle workers cost nothing and die with the process.
    static FramePool* pool = new FramePool();
    return *pool;
  }

  // 0 = auto.  Takes effect at next Run(); after a shrink, surplus
  // workers stay alive but sit out batches (participation is capped
  // per generation below), so the effective width really drops.
  void SetThreads(int n) {
    std::lock_guard<std::mutex> lock(config_mutex_);
    configured_ = n;
  }

  int EffectiveThreads() {
    std::lock_guard<std::mutex> lock(config_mutex_);
    if (configured_ > 0) return std::min(configured_, 64);
    unsigned hw = std::thread::hardware_concurrency();
    return (int)std::min(8u, hw ? hw : 1u);
  }

  // Number of distinct threads that encoded during the last completed
  // Run() — a test probe for the SetThreads width cap.
  int LastWidth() {
    std::lock_guard<std::mutex> lock(mutex_);
    return (int)width_;
  }

  // Run tasks[0..count); returns false if pooling is pointless (one
  // worker) and the caller should run serially.
  bool Run(const std::function<void(size_t)>& task, size_t count) {
    int want = EffectiveThreads();
    if (want <= 1 || count < 2) return false;
    std::lock_guard<std::mutex> run_lock(run_mutex_);  // one batch at a time
    EnsureWorkers((size_t)std::min<size_t>((size_t)want, count) - 1);
    uint64_t gen;
    {
      std::lock_guard<std::mutex> lock(mutex_);
      task_ = &task;
      count_ = count;
      next_ = 0;
      done_ = 0;
      error_ = nullptr;
      active_ = std::min<size_t>((size_t)want, count) - 1;
      claimed_ = 0;
      width_ = 0;
      gen = ++generation_;
    }
    cv_.notify_all();
    Drain(gen);  // the calling thread is worker 0
    std::exception_ptr err;
    {
      std::unique_lock<std::mutex> lock(mutex_);
      finished_cv_.wait(lock, [&] { return done_ == count_; });
      // The task reference dies with this frame: detach it under the
      // lock so a late-waking worker can never touch it.
      task_ = nullptr;
      err = error_;
      error_ = nullptr;
    }
    // A task that threw (e.g. bad_alloc) is rethrown HERE, on the
    // calling thread, after every handed-out index has finished — the
    // caller sees exactly what the serial path would have thrown,
    // instead of std::terminate on a detached worker.
    if (err) std::rethrow_exception(err);
    return true;
  }

 private:
  FramePool() = default;
  ~FramePool() = delete;  // see Instance()

  void EnsureWorkers(size_t n) {
    std::lock_guard<std::mutex> lock(mutex_);
    while (workers_.size() < n) {
      workers_.emplace_back([this] { WorkerLoop(); });
      workers_.back().detach();
    }
  }

  // Pull tasks for generation `gen` only.  The handout is under the
  // mutex, so a worker that observed a stale generation exits without
  // ever touching the (possibly destroyed) task object, and Run()
  // cannot return while any handed-out index is still executing
  // (done_ < count_ keeps it waiting).
  void Drain(uint64_t gen) {
    bool counted = false;
    for (;;) {
      const std::function<void(size_t)>* task;
      size_t i;
      {
        std::lock_guard<std::mutex> lock(mutex_);
        if (generation_ != gen || task_ == nullptr || next_ >= count_) return;
        i = next_++;
        task = task_;
        if (!counted) {
          counted = true;
          ++width_;  // distinct threads that actually encoded this batch
        }
      }
      std::exception_ptr err;
      try {
        (*task)(i);
      } catch (...) {
        err = std::current_exception();
      }
      {
        std::lock_guard<std::mutex> lock(mutex_);
        if (generation_ == gen) {
          if (err && !error_) error_ = err;
          if (++done_ == count_) finished_cv_.notify_all();
        }
      }
    }
  }

  void WorkerLoop() {
    uint64_t seen = 0;
    for (;;) {
      uint64_t gen;
      bool participate;
      {
        std::unique_lock<std::mutex> lock(mutex_);
        cv_.wait(lock, [&] { return stop_ || generation_ != seen; });
        if (stop_) return;
        seen = gen = generation_;
        // Cap the batch's width at the currently configured thread
        // count even when more workers exist from an earlier, larger
        // configuration.
        participate = claimed_ < active_;
        if (participate) ++claimed_;
      }
      if (participate) Drain(gen);
    }
  }

  std::mutex config_mutex_;
  int configured_ = 0;

  std::mutex run_mutex_;
  std::mutex mutex_;
  std::condition_variable cv_;
  std::condition_variable finished_cv_;
  std::vector<std::thread> workers_;
  const std::function<void(size_t)>* task_ = nullptr;  // guarded by mutex_
  size_t count_ = 0;                                   // guarded by mutex_
  size_t next_ = 0;                                    // guarded by mutex_
  size_t done_ = 0;                                    // guarded by mutex_
  size_t active_ = 0;                                  // guarded by mutex_
  size_t claimed_ = 0;                                 // guarded by mutex_
  size_t width_ = 0;                                   // guarded by mutex_
  uint64_t generation_ = 0;                            // guarded by mutex_
  std::exception_ptr error_;                           // guarded by mutex_
  bool stop_ = false;
};

}  // namespace folve
