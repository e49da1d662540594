from aircraft_tpu.rl.ddpg import (
    CurriculumLearning,
    CurriculumStage,
    DDPGAgent,
    OUNoise,
    ReplayBuffer,
    Transition,
)

__all__ = [
    "DDPGAgent",
    "ReplayBuffer",
    "OUNoise",
    "Transition",
    "CurriculumLearning",
    "CurriculumStage",
]
