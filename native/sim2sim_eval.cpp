// Native batch sim2sim evaluator: parallel MuJoCo rollouts of an exported
// policy across CPU cores.
//
// The reference's cross-simulator validation (humanoid/scripts/sim2sim.py)
// is a single-threaded Python loop at 1 kHz — fine for one rollout, far too
// slow for evaluation sweeps (seeds x commands x terrains). This tool is the
// framework's native eval-farm runtime: each worker thread owns an mjData,
// replays the exact deployment observation contract (47-dim frame, 15-deep
// history, 100 Hz policy / 1 kHz PD, clip +-18; reference sim2sim.py:124-157)
// and reports per-rollout outcomes as JSON lines.
//
// Build:  make -C native            (links the mujoco shared library shipped
//                                    with the python package)
// Run:    hgt_sim2sim_eval --model XBot-L.xml --policy policy.bin \
//             --rollouts 16 --duration 10 --threads 8 [--vx 0.4]
//
// Policy format "HGTP" (written by export/policy_export.py): int32 n_layers,
// then per layer int32 in_dim, int32 out_dim, f32 W[in*out] row-major,
// f32 b[out]. Hidden activations are ELU, final layer linear
// (reference actor_critic.py:50-74).

#include <mujoco/mujoco.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Layer {
  int in = 0, out = 0;
  std::vector<float> W;  // row-major (in, out)
  std::vector<float> b;
};

struct Policy {
  std::vector<Layer> layers;

  bool load(const std::string& path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    char magic[4];
    f.read(magic, 4);
    if (std::memcmp(magic, "HGTP", 4) != 0) return false;
    int32_t n = 0;
    f.read(reinterpret_cast<char*>(&n), 4);
    layers.resize(n);
    for (auto& l : layers) {
      int32_t d[2];
      f.read(reinterpret_cast<char*>(d), 8);
      l.in = d[0];
      l.out = d[1];
      l.W.resize(static_cast<size_t>(l.in) * l.out);
      l.b.resize(l.out);
      f.read(reinterpret_cast<char*>(l.W.data()), l.W.size() * 4);
      f.read(reinterpret_cast<char*>(l.b.data()), l.b.size() * 4);
    }
    return bool(f);
  }

  void forward(const std::vector<float>& obs, std::vector<float>& act) const {
    std::vector<float> x = obs, y;
    for (size_t li = 0; li < layers.size(); ++li) {
      const Layer& l = layers[li];
      y.assign(l.out, 0.f);
      for (int o = 0; o < l.out; ++o) y[o] = l.b[o];
      for (int i = 0; i < l.in; ++i) {
        const float xi = x[i];
        if (xi == 0.f) continue;
        const float* w = &l.W[static_cast<size_t>(i) * l.out];
        for (int o = 0; o < l.out; ++o) y[o] += xi * w[o];
      }
      if (li + 1 < layers.size())
        for (auto& v : y) v = v > 0.f ? v : std::expm1(v);
      x.swap(y);
    }
    act = x;
  }
};

struct Config {
  std::string model_path, policy_path;
  int rollouts = 8;
  int threads = static_cast<int>(std::thread::hardware_concurrency());
  double duration = 10.0;  // seconds
  double vx = 0.4, vy = 0.0, dyaw = 0.0;  // command (sim2sim.py:42-45)
  int decimation = 10;
  int frame_stack = 15;
  int num_single_obs = 47;
  int num_actions = 12;
  double cycle_time = 0.64;
  double action_scale = 0.25;
  double clip = 18.0;
  double obs_scale_dof_vel = 0.05;
  double obs_scale_lin_vel = 2.0;
  uint64_t seed = 0;
};

struct Result {
  int id;
  double distance_x, mean_height, fallen_at;  // fallen_at < 0: survived
};

void quat_to_euler(const double q_xyzw[4], double rpy[3]) {
  // reference sim2sim.py:48-67 (x,y,z,w input)
  const double x = q_xyzw[0], y = q_xyzw[1], z = q_xyzw[2], w = q_xyzw[3];
  rpy[0] = std::atan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y));
  double s = 2 * (w * y - z * x);
  s = s > 1 ? 1 : (s < -1 ? -1 : s);
  rpy[1] = std::asin(s);
  rpy[2] = std::atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z));
}

Result run_rollout(const mjModel* m, const Policy& pol, const Config& cfg,
                   int id) {
  mjData* d = mj_makeData(m);
  // small deterministic per-rollout perturbation of initial joint pos
  uint64_t rng = cfg.seed + 0x9e3779b97f4a7c15ull * (id + 1);
  auto frand = [&rng]() {
    rng ^= rng << 13;
    rng ^= rng >> 7;
    rng ^= rng << 17;
    return (double)(rng % 10000) / 10000.0 - 0.5;
  };
  for (int j = 0; j < cfg.num_actions; ++j)
    d->qpos[m->nq - cfg.num_actions + j] += 0.02 * frand();
  mj_step(m, d);

  const int kp_arr[12] = {200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15};
  const double kd = 10.0, tau_limit = 200.0;  // flat clamp, reference sim2sim.py:190

  std::deque<std::vector<float>> hist;
  for (int i = 0; i < cfg.frame_stack; ++i)
    hist.emplace_back(cfg.num_single_obs, 0.f);

  std::vector<float> action(cfg.num_actions, 0.f);
  std::vector<double> target_q(cfg.num_actions, 0.0);
  std::vector<float> stacked(cfg.frame_stack * cfg.num_single_obs);
  std::vector<float> out;

  const int orient_id = mj_name2id(m, mjOBJ_SENSOR, "orientation");
  const int gyro_id = mj_name2id(m, mjOBJ_SENSOR, "angular-velocity");
  const int orient_adr = orient_id >= 0 ? m->sensor_adr[orient_id] : -1;
  const int gyro_adr = gyro_id >= 0 ? m->sensor_adr[gyro_id] : -1;

  const int n_steps = static_cast<int>(cfg.duration / m->opt.timestep);
  double x0 = d->xpos[3 * 1 + 0];
  double height_sum = 0.0;
  int height_n = 0;
  double fallen_at = -1.0;

  for (int step = 0; step < n_steps; ++step) {
    const double* qj = d->qpos + (m->nq - cfg.num_actions);
    const double* dqj = d->qvel + (m->nv - cfg.num_actions);

    if (step % cfg.decimation == 0) {
      const double t = step * m->opt.timestep;
      std::vector<float> obs(cfg.num_single_obs, 0.f);
      double quat_xyzw[4] = {0, 0, 0, 1};
      if (orient_adr >= 0) {
        // sensor is wxyz; contract wants xyzw (sim2sim.py:74)
        quat_xyzw[0] = d->sensordata[orient_adr + 1];
        quat_xyzw[1] = d->sensordata[orient_adr + 2];
        quat_xyzw[2] = d->sensordata[orient_adr + 3];
        quat_xyzw[3] = d->sensordata[orient_adr + 0];
      }
      double rpy[3];
      quat_to_euler(quat_xyzw, rpy);
      for (int k = 0; k < 3; ++k)
        if (rpy[k] > M_PI) rpy[k] -= 2 * M_PI;
      const double phase = 2 * M_PI * t / cfg.cycle_time;
      obs[0] = std::sin(phase);
      obs[1] = std::cos(phase);
      obs[2] = cfg.vx * cfg.obs_scale_lin_vel;
      obs[3] = cfg.vy * cfg.obs_scale_lin_vel;
      obs[4] = cfg.dyaw;  // ang-vel scale 1.0
      for (int j = 0; j < cfg.num_actions; ++j) {
        obs[5 + j] = qj[j];
        obs[17 + j] = dqj[j] * cfg.obs_scale_dof_vel;
        obs[29 + j] = action[j];
      }
      for (int k = 0; k < 3; ++k) {
        obs[41 + k] = gyro_adr >= 0 ? d->sensordata[gyro_adr + k] : 0.0;
        obs[44 + k] = rpy[k];
      }
      for (auto& v : obs)
        v = v > cfg.clip ? cfg.clip : (v < -cfg.clip ? -cfg.clip : v);
      hist.pop_front();
      hist.push_back(obs);

      float* p = stacked.data();
      for (const auto& fr : hist) {
        std::memcpy(p, fr.data(), fr.size() * 4);
        p += fr.size();
      }
      pol.forward(stacked, out);
      for (int j = 0; j < cfg.num_actions; ++j) {
        float a = out[j];
        a = a > cfg.clip ? cfg.clip : (a < -cfg.clip ? -cfg.clip : a);
        action[j] = a;
        target_q[j] = a * cfg.action_scale;
      }
    }

    for (int j = 0; j < cfg.num_actions; ++j) {
      double tau = kp_arr[j] * (target_q[j] - qj[j]) - kd * dqj[j];
      tau = tau > tau_limit ? tau_limit : (tau < -tau_limit ? -tau_limit : tau);
      d->ctrl[j] = tau;
    }
    mj_step(m, d);

    if (step % 100 == 0) {
      const double z = d->xpos[3 * 1 + 2];
      height_sum += z;
      height_n++;
      if (fallen_at < 0 && z < 0.3) fallen_at = step * m->opt.timestep;
    }
  }

  Result r;
  r.id = id;
  r.distance_x = d->xpos[3 * 1 + 0] - x0;
  r.mean_height = height_n ? height_sum / height_n : 0.0;
  r.fallen_at = fallen_at;
  mj_deleteData(d);
  return r;
}

}  // namespace

int main(int argc, char** argv) {
  Config cfg;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(argv[++i]); };
    if (a == "--model") cfg.model_path = next();
    else if (a == "--policy") cfg.policy_path = next();
    else if (a == "--rollouts") cfg.rollouts = std::stoi(next());
    else if (a == "--threads") cfg.threads = std::stoi(next());
    else if (a == "--duration") cfg.duration = std::stod(next());
    else if (a == "--vx") cfg.vx = std::stod(next());
    else if (a == "--vy") cfg.vy = std::stod(next());
    else if (a == "--dyaw") cfg.dyaw = std::stod(next());
    else if (a == "--seed") cfg.seed = std::stoull(next());
    else {
      std::fprintf(stderr, "unknown arg %s\n", a.c_str());
      return 2;
    }
  }
  if (cfg.model_path.empty() || cfg.policy_path.empty()) {
    std::fprintf(stderr,
                 "usage: hgt_sim2sim_eval --model m.xml --policy p.bin "
                 "[--rollouts N] [--threads N] [--duration s] [--vx v]\n");
    return 2;
  }

  char err[1000];
  mjModel* m = mj_loadXML(cfg.model_path.c_str(), nullptr, err, sizeof(err));
  if (!m) {
    std::fprintf(stderr, "mj_loadXML failed: %s\n", err);
    return 1;
  }
  Policy pol;
  if (!pol.load(cfg.policy_path)) {
    std::fprintf(stderr, "bad policy file %s\n", cfg.policy_path.c_str());
    return 1;
  }

  std::vector<Result> results(cfg.rollouts);
  std::atomic<int> counter{0};
  auto worker = [&]() {
    while (true) {
      const int id = counter.fetch_add(1);
      if (id >= cfg.rollouts) break;
      results[id] = run_rollout(m, pol, cfg, id);
    }
  };
  std::vector<std::thread> pool;
  const int nthreads = std::max(1, std::min(cfg.threads, cfg.rollouts));
  for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();

  int survived = 0;
  double dist = 0;
  for (const auto& r : results) {
    std::printf(
        "{\"rollout\": %d, \"distance_x\": %.3f, \"mean_height\": %.3f, "
        "\"fallen_at_s\": %.2f}\n",
        r.id, r.distance_x, r.mean_height, r.fallen_at);
    if (r.fallen_at < 0) survived++;
    dist += r.distance_x;
  }
  std::printf(
      "{\"summary\": true, \"rollouts\": %d, \"survived\": %d, "
      "\"mean_distance_x\": %.3f, \"duration_s\": %.1f}\n",
      cfg.rollouts, survived, dist / cfg.rollouts, cfg.duration);
  mj_deleteModel(m);
  return 0;
}
