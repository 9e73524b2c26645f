// fastsim: native single-env crowd-navigation simulator (C ABI).
//
// Host-side counterpart of the TPU engine, playing the role the C++
// turtlebot3_fake node plays in the reference (a Gazebo-free kinematic
// robot simulator, turtlebot3_fake.cpp:123-179) plus the lidar: exact
// same diff-drive midpoint-Euler integration, axis-aligned-room + circle
// raycast, pedestrian integration with wall clamping.
//
// Uses: (1) microsecond-latency robot-side control loops in deployment
// (no JAX dependency on the robot), (2) a second independent
// implementation for cross-checking the JAX engine (ctypes-driven parity
// tests), (3) fast host-side trajectory rollouts for offline analysis.
//
// Build:  g++ -O3 -march=native -shared -fPIC fastsim.cpp -o libfastsim.so
// ABI: plain C structs/functions; see python wrapper in native/__init__.py.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

struct Config {
  int32_t n_scans;        // observation beams (359)
  int32_t n_peds;
  float dt;
  float wheel_separation;
  float wheel_radius;
  float robot_radius;
  float ped_radius;
  float room_half_inner;  // inner wall half-size
  float max_scan_range;
  float lidar_min_range;
  float goal_x, goal_y;
  float goal_eps;
  float min_scan_range;   // collision cut; <=0 disables
  int32_t max_steps;
};

struct State {
  float x, y, yaw;
  float prev_x, prev_y;
  int32_t step;
  int32_t done;       // 0 live, 1 success, 2 collision, 3 timeout
  float peds[2 * 64]; // up to 64 pedestrians, xy interleaved
};

inline float wrap_pi(float a) {
  while (a > static_cast<float>(M_PI)) a -= 2.0f * static_cast<float>(M_PI);
  while (a < -static_cast<float>(M_PI)) a += 2.0f * static_cast<float>(M_PI);
  return a;
}

}  // namespace

extern "C" {

// One differential-drive integration step; bit-matches
// crowdnav_tpu.envs.world.integrate_robot (and turtlebot3_fake.cpp).
void fastsim_integrate(const Config* cfg, State* st, float lin, float ang) {
  const float vl = lin - ang * cfg->wheel_separation * 0.5f;
  const float vr = lin + ang * cfg->wheel_separation * 0.5f;
  const float wl = vl / cfg->wheel_radius * cfg->dt;
  const float wr = vr / cfg->wheel_radius * cfg->dt;
  const float ds = cfg->wheel_radius * (wr + wl) * 0.5f;
  const float dth = cfg->wheel_radius * (wr - wl) / cfg->wheel_separation;
  const float mid = st->yaw + dth * 0.5f;
  st->prev_x = st->x;
  st->prev_y = st->y;
  st->x += ds * std::cos(mid);
  st->y += ds * std::sin(mid);
  const float lim = cfg->room_half_inner - cfg->robot_radius;
  st->x = std::min(std::max(st->x, -lim), lim);
  st->y = std::min(std::max(st->y, -lim), lim);
  st->yaw = wrap_pi(st->yaw + dth);
}

// Pedestrian kinematics with wall clamp (vel: n_peds*2 floats).
void fastsim_step_peds(const Config* cfg, State* st, const float* vel) {
  const float lim = cfg->room_half_inner - cfg->ped_radius;
  for (int i = 0; i < cfg->n_peds; ++i) {
    float px = st->peds[2 * i] + vel[2 * i] * cfg->dt;
    float py = st->peds[2 * i + 1] + vel[2 * i + 1] * cfg->dt;
    st->peds[2 * i] = std::min(std::max(px, -lim), lim);
    st->peds[2 * i + 1] = std::min(std::max(py, -lim), lim);
  }
}

// Observation-order lidar scan: beam i points at world angle yaw - i deg.
void fastsim_scan(const Config* cfg, const State* st, float* out) {
  const float deg = static_cast<float>(M_PI) / 180.0f;
  const float half = cfg->room_half_inner;
  const float r2 = cfg->ped_radius * cfg->ped_radius;
  for (int i = 0; i < cfg->n_scans; ++i) {
    const float a = st->yaw - static_cast<float>(i) * deg;
    const float dx = std::cos(a), dy = std::sin(a);
    float t;
    {
      const float tx = (dx != 0.0f)
          ? ((dx > 0 ? half : -half) - st->x) / dx : 1e9f;
      const float ty = (dy != 0.0f)
          ? ((dy > 0 ? half : -half) - st->y) / dy : 1e9f;
      t = std::min(tx, ty);
    }
    for (int p = 0; p < cfg->n_peds; ++p) {
      const float rx = st->peds[2 * p] - st->x;
      const float ry = st->peds[2 * p + 1] - st->y;
      const float b = rx * dx + ry * dy;
      const float disc = r2 - (rx * rx + ry * ry - b * b);
      if (disc >= 0.0f) {
        const float th = b - std::sqrt(disc);
        if (th >= 0.0f && th < t) t = th;
      }
    }
    out[i] = std::min(std::max(t, cfg->lidar_min_range), cfg->max_scan_range);
  }
}

// Full transition: integrate robot + peds, scan, termination flags.
// Returns done code (0 live). scan_out must hold n_scans floats.
int32_t fastsim_step(const Config* cfg, State* st, float lin, float ang,
                     const float* ped_vel, float* scan_out) {
  fastsim_integrate(cfg, st, lin, ang);
  if (ped_vel) fastsim_step_peds(cfg, st, ped_vel);
  st->step += 1;
  fastsim_scan(cfg, st, scan_out);
  float min_scan = 1e9f;
  for (int i = 0; i < cfg->n_scans; ++i) min_scan = std::min(min_scan, scan_out[i]);
  const bool at_goal = std::fabs(st->x - cfg->goal_x) <= cfg->goal_eps &&
                       std::fabs(st->y - cfg->goal_y) <= cfg->goal_eps;
  if (at_goal) st->done = 1;
  else if (cfg->min_scan_range > 0.0f && min_scan < cfg->min_scan_range)
    st->done = 2;
  else if (st->step >= cfg->max_steps) st->done = 3;
  return st->done;
}

// Batched rollout helper: run `n_steps` with per-step (lin, ang) commands,
// writing the (x, y, yaw) trajectory. Returns steps actually run (stops at
// episode end).
int32_t fastsim_rollout(const Config* cfg, State* st, const float* actions,
                        int32_t n_steps, const float* ped_vels,
                        float* traj_out, float* scan_buf) {
  int32_t n = 0;
  for (; n < n_steps; ++n) {
    const float* pv = ped_vels ? ped_vels + 2 * cfg->n_peds * n : nullptr;
    int32_t done = fastsim_step(cfg, st, actions[2 * n], actions[2 * n + 1],
                                pv, scan_buf);
    traj_out[3 * n] = st->x;
    traj_out[3 * n + 1] = st->y;
    traj_out[3 * n + 2] = st->yaw;
    if (done) { ++n; break; }
  }
  return n;
}

}  // extern "C"
