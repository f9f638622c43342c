// Golden single-instance roadway engine (C++).
//
// Stands in the native-component slot that Eclipse SUMO (C++) occupies in
// the reference system (env/sumo_simulator.py launches the SUMO binary
// and drives it over TraCI TCP).  The JAX engine in
// cm3_tpu/envs/roadway.py is the production vectorized implementation;
// this file is an independently-written scalar implementation of the SAME
// dynamics/reward/feasibility semantics, exercised from differential
// tests via ctypes (tests/test_roadway.py).
//
// Semantics source (reference): env/egocar_simple.py:63-92,138-292,
// env/multicar_simple.py:75-101,358-426, env_sumo/simple/*.xml.
//
// Build: make -C native   (produces libroadway_golden.so)

#include <algorithm>
#include <cmath>
#include <cstring>

namespace {

constexpr int kMaxCars = 8;

struct Params {
  double dt = 0.2;
  double total_length = 200.0;
  double total_width = 12.8;
  int n_lanes = 4;
  int sublanes_per_lane = 4;
  double sublane_res = 0.8;
  double car_length = 5.0;
  double car_width = 1.8;
  double acc_val = 2.5;
  double dec_val = 2.5;
  double v_max = 50.0;
  double v_min = 10.0;
  double overspeed = 35.7;
  double ttc_thres = 2.0;
  double res_forward = 2.5;
  int max_step = 40;  // round((200/25)/0.2)
  int n_sublanes() const { return n_lanes * sublanes_per_lane; }
};

struct State {
  int n = 0;
  double x[kMaxCars];
  int sublane[kMaxCars];
  double vel[kMaxCars];
  int steps[kMaxCars];
  int goal_lane[kMaxCars];
  double goal_pos[kMaxCars];
  bool terminal[kMaxCars];
  bool collided[kMaxCars];
  bool removed[kMaxCars];
};

Params g_params;

double lateral_y(const Params& p, int sublane) {
  return p.sublane_res * sublane - p.total_width;
}

enum Action { NOOP = 0, ACC = 1, DEC = 2, LEFT = 3, RIGHT = 4 };

}  // namespace

extern "C" {

void roadway_reset(State* s, int n, const int* lanes, const int* goal_lanes,
                   const double* goal_pos, const double* speeds,
                   const double* lead_steps) {
  std::memset(s, 0, sizeof(State));
  s->n = n;
  for (int i = 0; i < n; ++i) {
    s->sublane[i] = lanes[i] * g_params.sublanes_per_lane +
                    g_params.sublanes_per_lane / 2;
    s->vel[i] = speeds[i];
    // head start for earlier-departing cars (one free-drive step per step
    // of lead, at the initial speed)
    s->x[i] = speeds[i] * g_params.dt * std::round(lead_steps[i]);
    s->goal_lane[i] = goal_lanes[i];
    s->goal_pos[i] = goal_pos[i];
    s->steps[i] = 0;
    s->terminal[i] = s->collided[i] = s->removed[i] = false;
  }
}

// TTC / limit feasibility with first-feasible replacement
// (egocar_simple.py:255-292, multicar_simple.py:75-101).
void roadway_check_actions(const State* s, int* actions) {
  const Params& p = g_params;
  for (int i = 0; i < s->n; ++i) {
    if (s->removed[i]) continue;
    bool feas[5] = {true, true, true, true, true};
    if (s->vel[i] >= p.v_max) feas[ACC] = false;
    if (s->vel[i] <= p.v_min) feas[DEC] = false;
    if (s->sublane[i] >= p.n_sublanes() - 1) feas[LEFT] = false;
    if (s->sublane[i] <= 1) feas[RIGHT] = false;
    for (int j = 0; j < s->n; ++j) {
      if (j == i || s->removed[j]) continue;
      double dx = s->x[j] - s->x[i];
      double dy = lateral_y(p, s->sublane[j]) - lateral_y(p, s->sublane[i]);
      if (dx > 0 && s->vel[j] < s->vel[i] && std::fabs(dy) < p.car_width) {
        double dist = dx - p.car_length;
        double ttc = dist / (s->vel[i] - s->vel[j]);
        if (ttc <= p.ttc_thres) {
          feas[NOOP] = false;
          feas[ACC] = false;
        }
      }
    }
    if (!feas[actions[i]]) {
      for (int a = 0; a < 5; ++a) {
        if (feas[a]) {
          actions[i] = a;
          break;
        }
      }
    }
  }
}

// One control step; writes per-car rewards and the episode done flag.
void roadway_step(State* s, const int* actions, double* rewards, int* done) {
  const Params& p = g_params;
  const int n = s->n;
  bool live[kMaxCars];
  for (int i = 0; i < n; ++i) live[i] = !s->removed[i];

  // controls
  for (int i = 0; i < n; ++i) {
    if (!live[i]) continue;
    double acc = actions[i] == ACC ? p.acc_val
                 : actions[i] == DEC ? -p.dec_val
                                     : 0.0;
    s->vel[i] = std::clamp(s->vel[i] + p.dt * acc, 0.0, p.v_max);
    int dsub = actions[i] == LEFT ? 1 : actions[i] == RIGHT ? -1 : 0;
    s->sublane[i] =
        std::clamp(s->sublane[i] + dsub, 0, p.n_sublanes() - 1);
    s->x[i] += s->vel[i] * p.dt;
    s->steps[i] += 1;
  }

  // collisions: rectangle overlap between live cars
  bool hit[kMaxCars] = {false};
  for (int i = 0; i < n; ++i) {
    for (int j = i + 1; j < n; ++j) {
      if (!live[i] || !live[j]) continue;
      double dx = std::fabs(s->x[i] - s->x[j]);
      double dy = std::fabs(lateral_y(p, s->sublane[i]) -
                            lateral_y(p, s->sublane[j]));
      if (dx < p.car_length && dy < p.car_width) hit[i] = hit[j] = true;
    }
  }

  // lateral move into adjacent car (observation.py:100-112 geometry)
  bool lateral_crash[kMaxCars] = {false};
  for (int i = 0; i < n; ++i) {
    if (!live[i]) continue;
    for (int j = 0; j < n; ++j) {
      if (j == i || !live[j]) continue;
      double fwd = s->x[j] - s->x[i];
      bool same_row =
          fwd > -p.res_forward / 2 && fwd < 1.5 * p.res_forward;
      int sd = s->sublane[j] - s->sublane[i];
      if (same_row && sd >= 1 && sd <= 2 && actions[i] == LEFT)
        lateral_crash[i] = true;
      if (same_row && sd <= -1 && sd >= -2 && actions[i] == RIGHT)
        lateral_crash[i] = true;
    }
  }

  bool episode_crash = false;
  for (int i = 0; i < n; ++i) {
    if (!live[i]) {
      rewards[i] = 0.0;
      continue;
    }
    int goal_sub = s->goal_lane[i] * p.sublanes_per_lane +
                   p.sublanes_per_lane / 2;
    int delta_sub = goal_sub - s->sublane[i];
    double dist_to_goal = (s->goal_pos[i] - s->x[i]) / p.total_length;
    bool crashed = hit[i] || lateral_crash[i];
    bool at_goal = dist_to_goal <= 0.0;
    bool timed_out = s->steps[i] >= p.max_step;

    double r;
    if (crashed) {
      r = -1.0;
    } else if (at_goal) {
      r = delta_sub == 0
              ? 10.0
              : 10.0 * (1.0 - std::fabs((double)delta_sub) /
                                  p.n_sublanes());
    } else if (timed_out) {
      r = -10.0;
    } else {
      r = 0.0;
    }
    if (s->vel[i] >= p.overspeed) r -= 0.1;
    rewards[i] = r;

    if (crashed) {
      s->collided[i] = true;
      episode_crash = true;
    }
    if (crashed || at_goal || timed_out) s->terminal[i] = true;
  }

  bool all_removed = true;
  for (int i = 0; i < n; ++i) {
    s->removed[i] = s->removed[i] || s->terminal[i] || episode_crash;
    all_removed &= s->removed[i];
  }
  *done = (all_removed || episode_crash) ? 1 : 0;
}

int roadway_state_size() { return (int)sizeof(State); }

void roadway_get(const State* s, double* x, int* sublane, double* vel,
                 int* steps, int* terminal, int* collided, int* removed) {
  for (int i = 0; i < s->n; ++i) {
    x[i] = s->x[i];
    sublane[i] = s->sublane[i];
    vel[i] = s->vel[i];
    steps[i] = s->steps[i];
    terminal[i] = s->terminal[i];
    collided[i] = s->collided[i];
    removed[i] = s->removed[i];
  }
}

}  // extern "C"
