// Paced realtime loop for the controller mux.
//
// Role parity: the reference's controllers tick inside franka_control's
// 1 kHz RT callback (cartesian_vel_interface.cpp:119-197) — the robot
// paces the loop. Without a robot, something must pace it; a Python
// thread with time.sleep cannot (GIL + ms-granularity sleep). This loop
// lives in C++: absolute-deadline clock_nanosleep pacing (drift-free),
// driver access through a C vtable (native plant, libfranka shim, or a
// ctypes-wrapped Python driver), per-tick jitter/missed-deadline stats,
// and a native stamped-state ring for the message-stamp alignment that
// observe() needs (sensor_utils.py:322-358).

#pragma once

#include <atomic>
#include <cstdint>
#include <mutex>
#include <thread>
#include <vector>

#include "ealv/controllers.h"

namespace ealv {

// The plant the loop ticks against. Function pointers + user cookie so the
// same loop drives a native SIL plant, a hardware shim, or (degraded, for
// bring-up only) a ctypes-wrapped Python driver.
struct DriverVTable {
  void* user = nullptr;
  void (*state)(void* user, double* pose6, double* vel6,
                double* wrench6) = nullptr;
  void (*apply_velocity)(void* user, const double* twist6) = nullptr;
  void (*apply_pose)(void* user, const double* pose16) = nullptr;
  // current EE pose, column-major 4x4 (pose mode input); optional
  void (*pose_matrix)(void* user, double* pose16) = nullptr;
};

struct LoopStats {
  uint64_t ticks = 0;
  uint64_t missed = 0;     // wake > deadline + period (a lost tick)
  double jitter_sum = 0;   // sum of (wake - deadline), seconds
  double jitter_max = 0;
  double elapsed = 0;      // seconds since start()
};

// Stamped (t, pose, vel, wrench) ring with closest-stamp lookup — the
// native edition of the rospy message_filters.Cache alignment.
class StateRing {
 public:
  struct Entry {
    double stamp = 0;
    Vec6 pose{}, vel{}, wrench{};
  };
  explicit StateRing(int cap = 64);
  void push(double stamp, const Vec6& pose, const Vec6& vel,
            const Vec6& wrench);
  bool closest(double t, Entry* out) const;
  bool latest(Entry* out) const;

 private:
  mutable std::mutex mu_;
  std::vector<Entry> buf_;
  int size_ = 0, head_ = 0;
};

// Fixed-period loop thread: each tick reads the plant state, pushes it
// into the ring, feeds the wrench to the mux, and applies the active
// mode's output. Period is held with absolute deadlines
// (clock_nanosleep TIMER_ABSTIME on CLOCK_MONOTONIC — the same clock as
// Python's time.monotonic, so ring stamps align with camera stamps taken
// host-side). An overrun resynchronizes to now instead of bursting.
class RtLoop {
 public:
  RtLoop(ControllerMux* mux, const DriverVTable& drv, double dt);
  ~RtLoop();

  void start();
  void stop();
  bool running() const { return running_.load(); }

  LoopStats stats() const;
  const StateRing& ring() const { return ring_; }

 private:
  void run();

  ControllerMux* mux_;
  DriverVTable drv_;
  double dt_;
  StateRing ring_;
  std::thread thread_;
  std::atomic<bool> running_{false};
  mutable std::mutex smu_;
  LoopStats stats_;
};

// Built-in SIL plant: a velocity-integrator end effector in C++, so the
// loop's achieved rate and jitter can be measured with zero Python (and
// zero GIL) in the path.
class SilPlant {
 public:
  explicit SilPlant(double dt) : dt_(dt) {}

  void state(double* pose6, double* vel6, double* wrench6) const;
  void apply_velocity(const double* twist6);
  void set_wrench(const Vec6& w);

  static void c_state(void* user, double* p, double* v, double* w) {
    static_cast<SilPlant*>(user)->state(p, v, w);
  }
  static void c_apply_velocity(void* user, const double* t) {
    static_cast<SilPlant*>(user)->apply_velocity(t);
  }

 private:
  mutable std::mutex mu_;
  double dt_;
  Vec6 pose_{}, vel_{}, wrench_{};
};

}  // namespace ealv
