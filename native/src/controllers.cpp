#include "ealv/controllers.h"

#include <cmath>

namespace ealv {

namespace {
double norm3(const double* v) {
  return std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
}
}  // namespace

// ---------------------------------------------------------------- VelFilter

VelFilter::VelFilter(const VelFilterConfig& cfg) : cfg_(cfg) {}

bool VelFilter::command(const Vec6& twist, bool rt_ok) {
  raw_ = twist;
  fresh_ = true;
  if (!rt_ok) {
    // robot stopped moving: ramp up again from scratch
    // (cartesian_vel_interface.cpp:216-219)
    filtered_ = {};
  }
  return rt_ok;
}

void VelFilter::reset() { raw_ = {}; }

void VelFilter::set_wrench(const Vec6& wrench) { wrench_ = wrench; }

Vec6 VelFilter::tick() {
  if (fresh_) {
    stale_s_ = 0.0;
    fresh_ = false;
  } else {
    stale_s_ += cfg_.dt;
  }
  // decay the raw command when the planner went quiet (:136-140)
  if (stale_s_ > cfg_.cmd_dt * 2.0) {
    for (int i = 0; i < 6; ++i) raw_[i] *= cfg_.alpha;
  }

  const double norm_force = norm3(wrench_.data());
  const bool force_clamp = norm_force > 0.75 * cfg_.max_force;

  // desired per-tick change, with force safety (:143-167)
  Vec6 desired;
  for (int i = 0; i < 6; ++i) {
    if (force_clamp && i < 3 &&
        (std::signbit(wrench_[i]) != std::signbit(raw_[i]))) {
      desired[i] = 0.0 - filtered_[i];  // move away from the force
    } else if (force_clamp && i >= 3) {
      desired[i] = 0.0 - filtered_[i];  // stop rotating
    } else {
      desired[i] = raw_[i] - filtered_[i];
    }
  }

  // per-tick slew limits on the linear / angular change norms (:168-182)
  const double lin = norm3(desired.data());
  const double ang = norm3(desired.data() + 3);
  for (int i = 0; i < 6; ++i) {
    double step = desired[i];
    if (i < 3 && lin > cfg_.max_lin) step = step / lin * cfg_.max_lin;
    if (i >= 3 && ang > cfg_.max_ang) step = step / ang * cfg_.max_ang;
    filtered_[i] += step;
  }
  return filtered_;
}

// --------------------------------------------------------------- PoseFilter

PoseFilter::PoseFilter(const PoseFilterConfig& cfg) : cfg_(cfg) {}

void PoseFilter::start(const Mat4& current_pose) {
  raw_ = current_pose;
  filtered_ = current_pose;
  started_ = true;
  stale_s_ = 0.0;
}

void PoseFilter::command(const Mat4& pose) {
  raw_ = pose;
  fresh_ = true;
}

void PoseFilter::increase_z(double dz) { raw_[14] += dz; }

void PoseFilter::set_wrench(const Vec6& wrench) { wrench_ = wrench; }

Mat4 PoseFilter::tick(const Mat4& current_pose) {
  if (!started_) start(current_pose);
  Mat4 commanded = current_pose;
  if (fresh_) {
    stale_s_ = 0.0;
    fresh_ = false;
  } else {
    stale_s_ += 1e-3;
    if (cfg_.enforce_dt && stale_s_ > cfg_.dt) {
      raw_ = filtered_;  // freeze when stale (cartesian_pose_interface.cpp:127-129)
    }
  }
  for (int i = 0; i < 16; ++i) {
    bool update = true;
    if (i > 11 && i < 15) {  // translation column: force guard (:138-147)
      const int axis = i - 12;
      if (std::fabs(wrench_[axis]) > cfg_.max_force &&
          std::signbit(wrench_[axis]) == std::signbit(raw_[i])) {
        update = false;
        raw_[i] = current_pose[i];
        raw_[14] += cfg_.z_lift;  // lift z away from contact
      }
    }
    if (update) {
      filtered_[i] = cfg_.alpha1 * filtered_[i] + (1.0 - cfg_.alpha1) * raw_[i];
      commanded[i] =
          cfg_.alpha2 * current_pose[i] + (1.0 - cfg_.alpha2) * filtered_[i];
    }
  }
  return commanded;
}

// -------------------------------------------------------------- JointFilter

JointFilter::JointFilter(const JointFilterConfig& cfg) : cfg_(cfg) {}

void JointFilter::command(const Vec7& target) {
  target_ = target;
  fresh_ = true;
  have_target_ = true;
}

Vec7 JointFilter::tick(const Vec7& current) {
  if (!have_target_) {
    target_ = current;
    have_target_ = true;
  }
  if (fresh_) {
    stale_s_ = 0.0;
    fresh_ = false;
  } else {
    stale_s_ += cfg_.tick_dt;
    if (cfg_.enforce_dt && stale_s_ > cfg_.cmd_dt * 5.0) {
      target_ = last_cmd_;  // stop moving when stale (joint_pose_interface.cpp:110-113)
    }
  }
  Vec7 out;
  for (int i = 0; i < 7; ++i) {
    const double error = target_[i] - current[i];
    integral_[i] += error * cfg_.pid_dt;
    const double derivative = (error - pre_error_[i]) / cfg_.pid_dt;
    pre_error_[i] = error;
    double delta = cfg_.kp * error + cfg_.ki * integral_[i] + cfg_.kd * derivative;
    if (delta > cfg_.max_step) delta = cfg_.max_step;
    if (delta < -cfg_.max_step) delta = -cfg_.max_step;
    out[i] = current[i] + delta;  // slew-clamped step (:128-141)
  }
  last_cmd_ = out;
  return out;
}

// ------------------------------------------------------------- WrenchFilter

WrenchFilter::WrenchFilter(const WrenchFilterConfig& cfg) : cfg_(cfg) {}

Vec6 WrenchFilter::update(const Vec6& raw, const std::array<double, 9>& R_ee,
                          bool external_fts) {
  Vec6 w = raw;
  if (external_fts) {
    // sensor mounting yaw offset (cartesian_state_interface.cpp:194-252)
    const double c = std::cos(cfg_.fts_yaw), s = std::sin(cfg_.fts_yaw);
    const Vec6 in = w;
    w[0] = c * in[0] - s * in[1];
    w[1] = s * in[0] + c * in[1];
    w[3] = c * in[3] - s * in[4];
    w[4] = s * in[3] + c * in[4];
    // rotate force/torque into the base frame
    Vec6 base{};
    for (int r = 0; r < 3; ++r) {
      for (int k = 0; k < 3; ++k) {
        base[r] += R_ee[3 * r + k] * w[k];
        base[3 + r] += R_ee[3 * r + k] * w[3 + k];
      }
    }
    // gravity compensation of the sensor payload (base-frame -z force)
    base[2] += cfg_.sensor_mass * 9.81;
    // adjoint lever-arm correction: tau += p x F with p = (0, 0, -offset_z)
    const double pz = -cfg_.sensor_offset_z;
    base[3] += -pz * base[1];
    base[4] += pz * base[0];
    w = base;
  }
  for (int i = 0; i < 6; ++i) {
    value_[i] = cfg_.alpha * value_[i] + (1.0 - cfg_.alpha) * w[i];
  }
  return value_;
}

// ------------------------------------------------------------ ControllerMux

ControllerMux::ControllerMux(const VelFilterConfig& v, const PoseFilterConfig& p,
                             const JointFilterConfig& j)
    : vel_(v), pose_(p), joint_(j) {}

void ControllerMux::switch_mode(ControlMode mode) {
  std::lock_guard<std::mutex> lock(mu_);
  if (mode_ == mode) return;
  mode_ = mode;
  vel_.reset();  // fresh ramp after any switch
}

bool ControllerMux::command_twist(const Vec6& twist, bool rt_ok) {
  std::lock_guard<std::mutex> lock(mu_);
  return vel_.command(twist, rt_ok);
}

void ControllerMux::command_pose(const Mat4& pose) {
  std::lock_guard<std::mutex> lock(mu_);
  pose_.command(pose);
}

void ControllerMux::command_joints(const Vec7& joints) {
  std::lock_guard<std::mutex> lock(mu_);
  joint_.command(joints);
}

void ControllerMux::set_wrench(const Vec6& wrench) {
  std::lock_guard<std::mutex> lock(mu_);
  vel_.set_wrench(wrench);
  pose_.set_wrench(wrench);
}

Vec6 ControllerMux::tick_velocity() {
  std::lock_guard<std::mutex> lock(mu_);
  return vel_.tick();
}

Mat4 ControllerMux::tick_pose(const Mat4& current) {
  std::lock_guard<std::mutex> lock(mu_);
  return pose_.tick(current);
}

Vec7 ControllerMux::tick_joints(const Vec7& current) {
  std::lock_guard<std::mutex> lock(mu_);
  return joint_.tick(current);
}

}  // namespace ealv
