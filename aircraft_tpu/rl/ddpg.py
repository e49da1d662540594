"""DDPG reinforcement-learning controller in pure JAX/optax.

Parity with the reference's torch DDPG sideline (reference
src/aircraft/reinforce/rl.py: 256/128 tanh actor, critic, replay buffer,
OU/Gaussian exploration, soft target updates τ=1e-3) — rebuilt so the
*entire* actor/critic update step is one jitted program and the environment
rollout uses the same 6-DoF dynamics kernels as the solver stack (the
reference stepped `aircraft.state_update.expand()` per transition,
main/rl/rl.py:58).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


# ---------------------------------------------------------------------------
# networks (reference rl.py:106-169)
# ---------------------------------------------------------------------------


@struct.dataclass
class MLPParams:
    layers: tuple  # tuple of (w, b)

    @classmethod
    def init(cls, key, sizes, final_scale=3e-3):
        layers = []
        keys = jax.random.split(key, len(sizes) - 1)
        for i, k in enumerate(keys):
            fan_in = sizes[i]
            if i == len(sizes) - 2:
                bound = final_scale
            else:
                bound = 1.0 / np.sqrt(fan_in)
            w = jax.random.uniform(k, (sizes[i], sizes[i + 1]), minval=-bound, maxval=bound)
            b = jnp.zeros(sizes[i + 1])
            layers.append((w, b))
        return cls(layers=tuple(layers))


def mlp_apply(p: MLPParams, x, final_tanh=False):
    h = x
    n = len(p.layers)
    for i, (w, b) in enumerate(p.layers):
        h = h @ w + b
        if i < n - 1:
            h = jax.nn.relu(h)
    return jnp.tanh(h) if final_tanh else h


@struct.dataclass
class DDPGParams:
    actor: MLPParams
    critic: MLPParams
    target_actor: MLPParams
    target_critic: MLPParams


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    done: jax.Array


class ReplayBuffer:
    """Host-side ring buffer (reference rl.py:171-206)."""

    def __init__(self, capacity: int, obs_dim: int, act_dim: int):
        self.capacity = capacity
        self.obs = np.zeros((capacity, obs_dim), np.float32)
        self.action = np.zeros((capacity, act_dim), np.float32)
        self.reward = np.zeros((capacity,), np.float32)
        self.next_obs = np.zeros((capacity, obs_dim), np.float32)
        self.done = np.zeros((capacity,), np.float32)
        self.idx = 0
        self.size = 0

    def add(self, obs, action, reward, next_obs, done):
        i = self.idx
        self.obs[i] = obs
        self.action[i] = action
        self.reward[i] = reward
        self.next_obs[i] = next_obs
        self.done[i] = done
        self.idx = (i + 1) % self.capacity
        self.size = min(self.size + 1, self.capacity)

    def sample(self, rng: np.random.Generator, batch: int) -> Transition:
        idx = rng.integers(0, self.size, batch)
        return Transition(
            obs=jnp.asarray(self.obs[idx]),
            action=jnp.asarray(self.action[idx]),
            reward=jnp.asarray(self.reward[idx]),
            next_obs=jnp.asarray(self.next_obs[idx]),
            done=jnp.asarray(self.done[idx]),
        )


class OUNoise:
    """Ornstein–Uhlenbeck exploration (reference rl.py:23-48)."""

    def __init__(self, dim, mu=0.0, theta=0.15, sigma=0.2, rng=None):
        self.mu = mu * np.ones(dim)
        self.theta = theta
        self.sigma = sigma
        self.state = self.mu.copy()
        self.rng = rng or np.random.default_rng(0)

    def reset(self):
        self.state = self.mu.copy()

    def sample(self):
        dx = self.theta * (self.mu - self.state) + self.sigma * self.rng.standard_normal(
            len(self.mu)
        )
        self.state = self.state + dx
        return self.state


class ParameterSpaceNoise:
    """Adaptive parameter-space exploration (reference rl.py:51-75): perturb
    the actor's weights with Gaussian noise whose stddev adapts so the
    induced ACTION-space distance tracks a target."""

    def __init__(self, initial_std=0.1, target_action_std=0.2, adapt=1.01,
                 rng=None):
        self.std = initial_std
        self.target = target_action_std
        self.adapt = adapt
        self.rng = rng or np.random.default_rng(0)

    def perturb(self, params: "MLPParams") -> "MLPParams":
        layers = tuple(
            (
                w + jnp.asarray(self.rng.normal(0.0, self.std, w.shape),
                                dtype=w.dtype),
                b + jnp.asarray(self.rng.normal(0.0, self.std, b.shape),
                                dtype=b.dtype),
            )
            for w, b in params.layers
        )
        return MLPParams(layers=layers)

    def update(self, action_distance: float) -> None:
        """Grow noise when the perturbed policy moved less than the target
        action distance, shrink when it moved more."""
        if action_distance < self.target:
            self.std *= self.adapt
        else:
            self.std /= self.adapt


class EpsilonGreedy:
    """ε-greedy gate over a continuous policy (reference rl.py:78-99):
    with probability ε replace the policy action by a uniform random one;
    ε decays geometrically per sample."""

    def __init__(self, eps=1.0, eps_min=0.05, decay=0.995, rng=None):
        self.eps = eps
        self.eps_min = eps_min
        self.decay = decay
        self.rng = rng or np.random.default_rng(0)

    def select(self, action: np.ndarray, low: float, high: float) -> np.ndarray:
        explore = self.rng.random() < self.eps
        self.eps = max(self.eps_min, self.eps * self.decay)
        if explore:
            return self.rng.uniform(low, high, np.shape(action))
        return np.asarray(action)


class DDPGAgent:
    """Actor-critic with soft target updates (reference rl.py:221-351)."""

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        *,
        action_scale: float = 5.0,
        gamma: float = 0.99,
        tau: float = 1e-3,
        actor_lr: float = 1e-4,
        critic_lr: float = 1e-3,
        seed: int = 0,
        hidden: tuple = (256, 128),
    ):
        key = jax.random.PRNGKey(seed)
        ka, kc = jax.random.split(key)
        actor = MLPParams.init(ka, (obs_dim, *hidden, act_dim))
        critic = MLPParams.init(kc, (obs_dim + act_dim, *hidden, 1))
        self.params = DDPGParams(
            actor=actor, critic=critic, target_actor=actor, target_critic=critic
        )
        self.action_scale = action_scale
        self.gamma = gamma
        self.tau = tau
        self.actor_tx = optax.adam(actor_lr)
        self.critic_tx = optax.adam(critic_lr)
        self.actor_opt = self.actor_tx.init(actor)
        self.critic_opt = self.critic_tx.init(critic)
        self._update = jax.jit(self._make_update())

    def act(self, obs, noise: Optional[np.ndarray] = None) -> np.ndarray:
        a = np.asarray(
            mlp_apply(self.params.actor, jnp.asarray(obs), final_tanh=True)
        ) * self.action_scale
        if noise is not None:
            a = a + noise
        return np.clip(a, -self.action_scale, self.action_scale)

    def _make_update(self):
        gamma, tau, scale = self.gamma, self.tau, self.action_scale
        actor_tx, critic_tx = self.actor_tx, self.critic_tx

        def update(params: DDPGParams, actor_opt, critic_opt, batch: Transition):
            # critic: TD target from target nets
            next_a = mlp_apply(params.target_actor, batch.next_obs, final_tanh=True) * scale
            q_next = mlp_apply(
                params.target_critic, jnp.concatenate([batch.next_obs, next_a], -1)
            )[..., 0]
            target = batch.reward + gamma * (1.0 - batch.done) * q_next

            def critic_loss(c):
                q = mlp_apply(c, jnp.concatenate([batch.obs, batch.action], -1))[..., 0]
                return jnp.mean((q - target) ** 2)

            cl, cg = jax.value_and_grad(critic_loss)(params.critic)
            cu, critic_opt = critic_tx.update(cg, critic_opt)
            critic = optax.apply_updates(params.critic, cu)

            def actor_loss(a):
                act = mlp_apply(a, batch.obs, final_tanh=True) * scale
                q = mlp_apply(critic, jnp.concatenate([batch.obs, act], -1))[..., 0]
                return -jnp.mean(q)

            al, ag = jax.value_and_grad(actor_loss)(params.actor)
            au, actor_opt = actor_tx.update(ag, actor_opt)
            actor = optax.apply_updates(params.actor, au)

            soft = lambda t, s: jax.tree_util.tree_map(
                lambda tt, ss: (1 - tau) * tt + tau * ss, t, s
            )
            new = DDPGParams(
                actor=actor,
                critic=critic,
                target_actor=soft(params.target_actor, actor),
                target_critic=soft(params.target_critic, critic),
            )
            return new, actor_opt, critic_opt, cl, al

        return update

    def train_step(self, batch: Transition):
        self.params, self.actor_opt, self.critic_opt, cl, al = self._update(
            self.params, self.actor_opt, self.critic_opt, batch
        )
        return float(cl), float(al)


class CurriculumStage(NamedTuple):
    """Distance-graduated goal stage (reference main/rl/curriculum.py:27-60)."""

    name: str
    goal_distance: float
    success_threshold: float


DEFAULT_CURRICULUM = (
    CurriculumStage("stable_flight", 0.0, 0.8),
    CurriculumStage("straight_line", 50.0, 0.7),
    CurriculumStage("near_goal", 100.0, 0.6),
    CurriculumStage("far_goal", 200.0, 0.5),
)


class CurriculumLearning:
    """Advances through stages on rolling success rate
    (reference reinforce/curriculum.py:4-66)."""

    def __init__(self, stages=DEFAULT_CURRICULUM, window: int = 50):
        self.stages = stages
        self.window = window
        self.stage_idx = 0
        self.results: list[bool] = []

    @property
    def stage(self) -> CurriculumStage:
        return self.stages[self.stage_idx]

    def record(self, success: bool) -> bool:
        """Record an episode; returns True if the curriculum advanced."""
        self.results.append(bool(success))
        recent = self.results[-self.window :]
        if (
            len(recent) >= self.window
            and np.mean(recent) >= self.stage.success_threshold
            and self.stage_idx < len(self.stages) - 1
        ):
            self.stage_idx += 1
            self.results = []
            return True
        return False
