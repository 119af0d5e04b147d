#include "ealv/rt_loop.h"

#include <time.h>

#include <cmath>
#include <cstring>

namespace ealv {

namespace {

double now_monotonic() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}

void advance(timespec* t, double dt) {
  const long ns = static_cast<long>(dt * 1e9);
  t->tv_nsec += ns;
  while (t->tv_nsec >= 1000000000L) {
    t->tv_nsec -= 1000000000L;
    t->tv_sec += 1;
  }
}

double to_seconds(const timespec& t) { return t.tv_sec + t.tv_nsec * 1e-9; }

}  // namespace

// ------------------------------------------------------------- StateRing

StateRing::StateRing(int cap) : buf_(cap > 0 ? cap : 1) {}

void StateRing::push(double stamp, const Vec6& pose, const Vec6& vel,
                     const Vec6& wrench) {
  std::lock_guard<std::mutex> lock(mu_);
  Entry& e = buf_[head_];
  e.stamp = stamp;
  e.pose = pose;
  e.vel = vel;
  e.wrench = wrench;
  head_ = (head_ + 1) % static_cast<int>(buf_.size());
  if (size_ < static_cast<int>(buf_.size())) ++size_;
}

bool StateRing::closest(double t, Entry* out) const {
  std::lock_guard<std::mutex> lock(mu_);
  if (size_ == 0) return false;
  double best = -1.0;
  for (int i = 0; i < size_; ++i) {
    const double d = std::fabs(buf_[i].stamp - t);
    if (best < 0 || d < best) {
      best = d;
      *out = buf_[i];
    }
  }
  return true;
}

bool StateRing::latest(Entry* out) const {
  std::lock_guard<std::mutex> lock(mu_);
  if (size_ == 0) return false;
  const int last = (head_ + static_cast<int>(buf_.size()) - 1) %
                   static_cast<int>(buf_.size());
  *out = buf_[last];
  return true;
}

// --------------------------------------------------------------- RtLoop

RtLoop::RtLoop(ControllerMux* mux, const DriverVTable& drv, double dt)
    : mux_(mux), drv_(drv), dt_(dt) {}

RtLoop::~RtLoop() { stop(); }

void RtLoop::start() {
  if (running_.exchange(true)) return;
  {
    std::lock_guard<std::mutex> lock(smu_);
    stats_ = LoopStats{};
  }
  thread_ = std::thread(&RtLoop::run, this);
}

void RtLoop::stop() {
  if (!running_.exchange(false)) return;
  if (thread_.joinable()) thread_.join();
}

LoopStats RtLoop::stats() const {
  std::lock_guard<std::mutex> lock(smu_);
  return stats_;
}

void RtLoop::run() {
  const double t_start = now_monotonic();
  timespec deadline;
  clock_gettime(CLOCK_MONOTONIC, &deadline);

  Vec6 pose{}, vel{}, wrench{};
  Mat4 cur{};

  while (running_.load(std::memory_order_relaxed)) {
    advance(&deadline, dt_);
    clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &deadline, nullptr);
    const double wake = now_monotonic();
    const double jitter = wake - to_seconds(deadline);

    drv_.state(drv_.user, pose.data(), vel.data(), wrench.data());
    ring_.push(wake, pose, vel, wrench);
    mux_->set_wrench(wrench);

    switch (mux_->mode()) {
      case ControlMode::kVelocity: {
        const Vec6 out = mux_->tick_velocity();
        if (drv_.apply_velocity) drv_.apply_velocity(drv_.user, out.data());
        break;
      }
      case ControlMode::kPose: {
        if (drv_.pose_matrix && drv_.apply_pose) {
          drv_.pose_matrix(drv_.user, cur.data());
          const Mat4 out = mux_->tick_pose(cur);
          drv_.apply_pose(drv_.user, out.data());
        }
        break;
      }
      case ControlMode::kJoint:
        break;  // joint moves tick through the bridge's reset path
    }

    {
      std::lock_guard<std::mutex> lock(smu_);
      ++stats_.ticks;
      const double j = jitter > 0 ? jitter : 0.0;
      stats_.jitter_sum += j;
      if (j > stats_.jitter_max) stats_.jitter_max = j;
      if (j > dt_) ++stats_.missed;
      stats_.elapsed = wake - t_start;
    }
    if (jitter > dt_) {
      // overran at least one period: resync instead of bursting ticks
      clock_gettime(CLOCK_MONOTONIC, &deadline);
    }
  }
}

// -------------------------------------------------------------- SilPlant

void SilPlant::state(double* pose6, double* vel6, double* wrench6) const {
  std::lock_guard<std::mutex> lock(mu_);
  std::memcpy(pose6, pose_.data(), sizeof(pose_));
  std::memcpy(vel6, vel_.data(), sizeof(vel_));
  std::memcpy(wrench6, wrench_.data(), sizeof(wrench_));
}

void SilPlant::apply_velocity(const double* twist6) {
  std::lock_guard<std::mutex> lock(mu_);
  for (int i = 0; i < 6; ++i) {
    vel_[i] = twist6[i];
    pose_[i] += twist6[i] * dt_;
  }
}

void SilPlant::set_wrench(const Vec6& w) {
  std::lock_guard<std::mutex> lock(mu_);
  wrench_ = w;
}

}  // namespace ealv
