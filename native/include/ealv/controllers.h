// Realtime end-effector control filters for the hardware path.
//
// Role parity with the reference's four franka_hw controller plugins
// (franka_test/src/*.cpp), re-designed as a ROS-free library that runs
// inside any 1 kHz realtime loop (libfranka control callback, RT thread,
// or the software-in-the-loop harness used in tests):
//   - VelFilter:  cartesian_vel_interface.cpp:37-236 — slew-limited ramp
//     toward a commanded twist, stale-command decay, wrench safety
//     (oppose/stop motion when |F| > 0.75 * max_force), success gating.
//   - PoseFilter: cartesian_pose_interface.cpp:33-217 — double low-pass on
//     a commanded 4x4 pose, stale freeze, per-axis force guard lifting z.
//   - JointFilter: joint_pose_interface.cpp:29-164 — per-joint PID with a
//     2e-3 rad/tick slew clamp (joint reset/home moves).
//   - WrenchFilter: cartesian_state_interface.cpp:127-252 — low-pass
//     external wrench + external-FTS frame transform (yaw offset, gravity
//     compensation, adjoint to base frame).
// The ControllerMux (go_vel:32-160) switches modes under a lock and owns
// the reset/home targets.

#pragma once

#include <array>
#include <cstddef>
#include <mutex>

namespace ealv {

using Vec6 = std::array<double, 6>;
using Vec7 = std::array<double, 7>;
using Mat4 = std::array<double, 16>;  // column-major 4x4

struct VelFilterConfig {
  double dt = 1e-3;           // tick period (1 kHz loop)
  double cmd_dt = 0.1;        // expected command period
  double alpha = 0.999;       // stale-command decay factor
  double max_lin = 0.8e-3;    // per-tick linear slew limit
  double max_ang = 2.5e-3;    // per-tick angular slew limit
  double max_force = 30.0;    // wrench safety threshold
};

// Slew-limited velocity ramp with wrench safety.
class VelFilter {
 public:
  explicit VelFilter(const VelFilterConfig& cfg = {});

  // New commanded twist from the planner (the /vel_cmd service body).
  // Returns false — and resets the ramp — when the rt loop reported
  // failure (control_command_success_rate <= 0.5 analogue).
  bool command(const Vec6& twist, bool rt_ok = true);
  void reset();  // zero the raw command (reset_control_commands)
  void set_wrench(const Vec6& wrench);  // external FTS path

  // One 1 kHz tick: returns the twist to hand to the robot.
  Vec6 tick();

  const Vec6& filtered() const { return filtered_; }

 private:
  VelFilterConfig cfg_;
  Vec6 raw_{};       // latest commanded twist
  Vec6 filtered_{};  // ramped output
  Vec6 wrench_{};
  double stale_s_ = 0.0;
  bool fresh_ = false;
};

struct PoseFilterConfig {
  double dt = 0.1;
  double alpha1 = 0.999;  // raw -> filtered low-pass
  double alpha2 = 0.99;   // filtered -> commanded low-pass
  double max_force = 30.0;
  bool enforce_dt = true;
  double z_lift = 0.01;  // z nudge on force violation
};

// Double low-pass toward a commanded 4x4 pose with per-axis force guard.
class PoseFilter {
 public:
  explicit PoseFilter(const PoseFilterConfig& cfg = {});

  void start(const Mat4& current_pose);
  void command(const Mat4& pose);
  void increase_z(double dz);  // /increase_z nudge
  void set_wrench(const Vec6& wrench);

  // One tick: current commanded pose in, next commanded pose out.
  Mat4 tick(const Mat4& current_pose);

 private:
  PoseFilterConfig cfg_;
  Mat4 raw_{};
  Mat4 filtered_{};
  Vec6 wrench_{};
  double stale_s_ = 0.0;
  bool fresh_ = false;
  bool started_ = false;
};

struct JointFilterConfig {
  double tick_dt = 1e-3;  // realtime loop period (staleness accounting)
  double pid_dt = 0.1;    // PID integral/derivative time base — the
                          // reference uses the rosparam command period here
                          // (joint_pose_interface.cpp PID uses /dt = 0.1 s),
                          // which is what keeps Kd from dominating
  double kp = 0.02;
  double ki = 0.0;
  double kd = 0.02;
  double max_step = 2.0e-3;  // rad per tick
  bool enforce_dt = true;
  double cmd_dt = 0.1;
};

// Per-joint PID with slew clamp (home/reset moves).
class JointFilter {
 public:
  explicit JointFilter(const JointFilterConfig& cfg = {});

  void command(const Vec7& target);
  Vec7 tick(const Vec7& current);

 private:
  JointFilterConfig cfg_;
  Vec7 target_{};
  Vec7 integral_{};
  Vec7 pre_error_{};
  Vec7 last_cmd_{};
  double stale_s_ = 0.0;
  bool fresh_ = false;
  bool have_target_ = false;
};

struct WrenchFilterConfig {
  double alpha = 0.95;       // low-pass factor
  double sensor_mass = 0.0;  // gravity compensation (external FTS)
  double fts_yaw = 0.0;      // mounting yaw offset
  double sensor_offset_z = 0.0;  // lever arm for the adjoint transform
};

// Low-passed external wrench; optional external-FTS frame correction.
class WrenchFilter {
 public:
  explicit WrenchFilter(const WrenchFilterConfig& cfg = {});

  // raw: sensor-frame wrench; R_ee: 3x3 row-major EE orientation in base.
  Vec6 update(const Vec6& raw, const std::array<double, 9>& R_ee,
              bool external_fts = false);

  const Vec6& value() const { return value_; }

 private:
  WrenchFilterConfig cfg_;
  Vec6 value_{};
};

enum class ControlMode { kVelocity, kPose, kJoint };

// Mode multiplexer + high-level command surface (the go_vel node's job).
class ControllerMux {
 public:
  ControllerMux(const VelFilterConfig& v = {}, const PoseFilterConfig& p = {},
                const JointFilterConfig& j = {});

  void switch_mode(ControlMode mode);  // under lock (go_vel:46,109-114)
  ControlMode mode() const { return mode_; }

  bool command_twist(const Vec6& twist, bool rt_ok = true);
  void command_pose(const Mat4& pose);
  void command_joints(const Vec7& joints);
  void set_wrench(const Vec6& wrench);

  // per-tick outputs (only the active mode's output is meaningful)
  Vec6 tick_velocity();
  Mat4 tick_pose(const Mat4& current);
  Vec7 tick_joints(const Vec7& current);

  VelFilter& vel() { return vel_; }
  PoseFilter& pose() { return pose_; }
  JointFilter& joints() { return joint_; }

 private:
  mutable std::mutex mu_;
  ControlMode mode_ = ControlMode::kVelocity;
  VelFilter vel_;
  PoseFilter pose_;
  JointFilter joint_;
};

}  // namespace ealv
