"""Flax network definitions for all agent families."""

from crowdnav_tpu.models.networks import (  # noqa: F401
    DeterministicActor,
    DoubleCritic,
    GaussianActor,
    QCritic,
    QNetwork,
    ValueNetwork,
)
