"""DDPG training against the 6-DoF glider dynamics.

Parity with the reference RL loop (reference main/rl/rl.py: DDPG agent
stepping `aircraft.state_update`, goal-distance rewards; curriculum from
main/rl/curriculum.py).  The environment step is the same jitted dynamics
kernel the solvers use.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/train_ddpg.py --episodes 20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aircraft_tpu.config import glider_config
from aircraft_tpu.dynamics.aircraft import AircraftParams
from aircraft_tpu.rl import CurriculumLearning, DDPGAgent, OUNoise, ReplayBuffer
from aircraft_tpu.solvers import integrators


def make_env(params, dt=0.02, substeps=2):
    step = jax.jit(integrators.make_step_fn(params, substeps=substeps, normalize="step"))

    def env_step(x, action):
        u = jnp.zeros(7).at[0].set(action[0]).at[1].set(action[1]).at[2].set(action[2])
        return step(jnp.asarray(x), u, dt)

    return env_step


def obs_from_state(x, goal):
    x = np.asarray(x)
    return np.concatenate([
        (goal - x[:3]) / 100.0, x[3:6] / 50.0, x[6:10], x[10:13],
    ]).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=50)
    ap.add_argument("--steps", type=int, default=150)
    args = ap.parse_args()

    cfg = glider_config()
    params = AircraftParams.from_config(cfg.aircraft)
    env_step = make_env(params)
    rng = np.random.default_rng(0)

    agent = DDPGAgent(obs_dim=13, act_dim=3, action_scale=5.0, seed=0)
    buf = ReplayBuffer(100_000, 13, 3)
    noise = OUNoise(3, sigma=0.3, rng=rng)
    curriculum = CurriculumLearning()

    x_init = np.asarray(cfg.waypoints.initial_state, np.float32)

    for ep in range(args.episodes):
        stage = curriculum.stage
        goal = x_init[:3] + np.array([stage.goal_distance, 0.0, 0.0])
        x = x_init.copy()
        noise.reset()
        total_r, prev_d = 0.0, np.linalg.norm(goal - x[:3])
        for t in range(args.steps):
            o = obs_from_state(x, goal)
            a = agent.act(o, noise=noise.sample())
            x_next = np.asarray(env_step(x, jnp.asarray(a)))
            if not np.all(np.isfinite(x_next)):
                buf.add(o, a, -50.0, o * 0, True)
                break
            d = np.linalg.norm(goal - x_next[:3])
            r = (prev_d - d) - 0.01 * float(np.sum(a**2))  # progress reward
            done = d < 10.0
            buf.add(o, a, r, obs_from_state(x_next, goal), done)
            total_r += r
            x, prev_d = x_next, d
            if done:
                break
            if buf.size > 1000:
                agent.train_step(buf.sample(rng, 64))
        success = prev_d < 25.0 or stage.goal_distance == 0.0
        advanced = curriculum.record(success)
        print(f"ep {ep:3d} stage={stage.name:13s} return={total_r:8.2f} "
              f"final_d={prev_d:7.1f}{'  -> advanced' if advanced else ''}",
              flush=True)


if __name__ == "__main__":
    main()
