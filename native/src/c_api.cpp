// C ABI for ctypes bindings (no pybind11 in this toolchain).

#include <cstring>

#include "ealv/controllers.h"
#include "ealv/rt_loop.h"

using namespace ealv;

extern "C" {

// ---- ControllerMux lifecycle ----
void* ealv_mux_create(double dt, double cmd_dt, double max_force) {
  VelFilterConfig v;
  v.dt = dt;
  v.cmd_dt = cmd_dt;
  v.max_force = max_force;
  PoseFilterConfig p;
  p.dt = cmd_dt;
  p.max_force = max_force;
  JointFilterConfig j;
  j.tick_dt = dt;
  j.pid_dt = cmd_dt;
  return new ControllerMux(v, p, j);
}

void ealv_mux_destroy(void* h) { delete static_cast<ControllerMux*>(h); }

void ealv_mux_switch_mode(void* h, int mode) {
  static_cast<ControllerMux*>(h)->switch_mode(static_cast<ControlMode>(mode));
}

int ealv_mux_mode(void* h) {
  return static_cast<int>(static_cast<ControllerMux*>(h)->mode());
}

int ealv_mux_command_twist(void* h, const double* twist, int rt_ok) {
  Vec6 t;
  std::memcpy(t.data(), twist, sizeof(t));
  return static_cast<ControllerMux*>(h)->command_twist(t, rt_ok != 0) ? 1 : 0;
}

void ealv_mux_command_pose(void* h, const double* pose16) {
  Mat4 p;
  std::memcpy(p.data(), pose16, sizeof(p));
  static_cast<ControllerMux*>(h)->command_pose(p);
}

void ealv_mux_command_joints(void* h, const double* joints7) {
  Vec7 j;
  std::memcpy(j.data(), joints7, sizeof(j));
  static_cast<ControllerMux*>(h)->command_joints(j);
}

void ealv_mux_set_wrench(void* h, const double* wrench6) {
  Vec6 w;
  std::memcpy(w.data(), wrench6, sizeof(w));
  static_cast<ControllerMux*>(h)->set_wrench(w);
}

void ealv_mux_tick_velocity(void* h, double* out6) {
  Vec6 v = static_cast<ControllerMux*>(h)->tick_velocity();
  std::memcpy(out6, v.data(), sizeof(v));
}

void ealv_mux_tick_pose(void* h, const double* current16, double* out16) {
  Mat4 c;
  std::memcpy(c.data(), current16, sizeof(c));
  Mat4 o = static_cast<ControllerMux*>(h)->tick_pose(c);
  std::memcpy(out16, o.data(), sizeof(o));
}

void ealv_mux_tick_joints(void* h, const double* current7, double* out7) {
  Vec7 c;
  std::memcpy(c.data(), current7, sizeof(c));
  Vec7 o = static_cast<ControllerMux*>(h)->tick_joints(c);
  std::memcpy(out7, o.data(), sizeof(o));
}

// ---- standalone WrenchFilter ----
void* ealv_wrench_create(double alpha, double sensor_mass, double fts_yaw,
                         double sensor_offset_z) {
  WrenchFilterConfig cfg;
  cfg.alpha = alpha;
  cfg.sensor_mass = sensor_mass;
  cfg.fts_yaw = fts_yaw;
  cfg.sensor_offset_z = sensor_offset_z;
  return new WrenchFilter(cfg);
}

void ealv_wrench_destroy(void* h) { delete static_cast<WrenchFilter*>(h); }

void ealv_wrench_update(void* h, const double* raw6, const double* R_ee9,
                        int external_fts, double* out6) {
  Vec6 raw;
  std::array<double, 9> R;
  std::memcpy(raw.data(), raw6, sizeof(raw));
  std::memcpy(R.data(), R_ee9, sizeof(R));
  Vec6 o = static_cast<WrenchFilter*>(h)->update(raw, R, external_fts != 0);
  std::memcpy(out6, o.data(), sizeof(o));
}


// ---- RtLoop + SIL plant ----

typedef void (*ealv_state_fn)(void*, double*, double*, double*);
typedef void (*ealv_apply_vel_fn)(void*, const double*);
typedef void (*ealv_apply_pose_fn)(void*, const double*);
typedef void (*ealv_pose_matrix_fn)(void*, double*);

void* ealv_loop_create(void* mux, double dt, void* user, ealv_state_fn state,
                       ealv_apply_vel_fn apply_vel,
                       ealv_apply_pose_fn apply_pose,
                       ealv_pose_matrix_fn pose_matrix) {
  DriverVTable drv;
  drv.user = user;
  drv.state = state;
  drv.apply_velocity = apply_vel;
  drv.apply_pose = apply_pose;
  drv.pose_matrix = pose_matrix;
  return new RtLoop(static_cast<ControllerMux*>(mux), drv, dt);
}

void* ealv_sil_plant_create(double dt) { return new SilPlant(dt); }
void ealv_sil_plant_destroy(void* h) { delete static_cast<SilPlant*>(h); }

void ealv_sil_plant_state(void* h, double* pose6, double* vel6,
                          double* wrench6) {
  static_cast<SilPlant*>(h)->state(pose6, vel6, wrench6);
}

void ealv_sil_plant_set_wrench(void* h, const double* w6) {
  Vec6 w;
  std::memcpy(w.data(), w6, sizeof(w));
  static_cast<SilPlant*>(h)->set_wrench(w);
}

// all-native loop over the built-in SIL plant (no Python in the tick path)
void* ealv_loop_create_sil(void* mux, double dt, void* plant) {
  DriverVTable drv;
  drv.user = plant;
  drv.state = &SilPlant::c_state;
  drv.apply_velocity = &SilPlant::c_apply_velocity;
  return new RtLoop(static_cast<ControllerMux*>(mux), drv, dt);
}

void ealv_loop_destroy(void* h) { delete static_cast<RtLoop*>(h); }
void ealv_loop_start(void* h) { static_cast<RtLoop*>(h)->start(); }
void ealv_loop_stop(void* h) { static_cast<RtLoop*>(h)->stop(); }

// out5 = [ticks, missed, jitter_mean_s, jitter_max_s, elapsed_s]
void ealv_loop_stats(void* h, double* out5) {
  const LoopStats s = static_cast<RtLoop*>(h)->stats();
  out5[0] = static_cast<double>(s.ticks);
  out5[1] = static_cast<double>(s.missed);
  out5[2] = s.ticks ? s.jitter_sum / static_cast<double>(s.ticks) : 0.0;
  out5[3] = s.jitter_max;
  out5[4] = s.elapsed;
}

static int ring_query(const StateRing& ring, bool latest, double t,
                      double* stamp, double* pose6, double* vel6,
                      double* wrench6) {
  StateRing::Entry e;
  const bool ok = latest ? ring.latest(&e) : ring.closest(t, &e);
  if (!ok) return 0;
  *stamp = e.stamp;
  std::memcpy(pose6, e.pose.data(), sizeof(e.pose));
  std::memcpy(vel6, e.vel.data(), sizeof(e.vel));
  std::memcpy(wrench6, e.wrench.data(), sizeof(e.wrench));
  return 1;
}

int ealv_loop_state_closest(void* h, double t, double* stamp, double* pose6,
                            double* vel6, double* wrench6) {
  return ring_query(static_cast<RtLoop*>(h)->ring(), false, t, stamp, pose6,
                    vel6, wrench6);
}

int ealv_loop_state_latest(void* h, double* stamp, double* pose6,
                           double* vel6, double* wrench6) {
  return ring_query(static_cast<RtLoop*>(h)->ring(), true, 0.0, stamp, pose6,
                    vel6, wrench6);
}

}  // extern "C"
