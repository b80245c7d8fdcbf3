"""Engine configuration.

The reference uses a mutable module singleton (``MOBPY/config.py:15-221``);
mutable globals don't travel to Ray workers, so here config is an explicit
frozen value passed down (or defaulted). Only ``epsilon`` is algorithmic:
the reference's PAVA violation checks and WoE clipping both use
``epsilon=1e-12`` (``MOBPY/config.py:35``).
"""

from __future__ import annotations

from dataclasses import dataclass

EPSILON: float = 1e-12


@dataclass(frozen=True)
class EngineConfig:
    """Immutable engine-level knobs.

    Attributes:
        epsilon: numerical tolerance used in PAVA violation checks,
            strict-monotonicity plateau merging and WoE clipping.
        target_batch_size: default rows per batch for stateless
            map_batches stages.
        decode_batch_bytes: approximate byte budget per decode batch
            (binary image payloads — batch size is derived from this,
            not from a row count).
        num_buckets: default hash-bucket count for entity-partitioned
            temporal operators. At cluster scale this should be a small
            multiple of total cores.
    """

    epsilon: float = EPSILON
    target_batch_size: int = 65536
    decode_batch_bytes: int = 64 * 1024 * 1024
    num_buckets: int = 64

    def to_json(self) -> str:
        import json
        from dataclasses import asdict

        return json.dumps(asdict(self))

    @staticmethod
    def from_json(s: str) -> "EngineConfig":
        import json

        return EngineConfig(**json.loads(s))

    @staticmethod
    def from_env(prefix: str = "MOBRAY_") -> "EngineConfig":
        """Environment overrides (the reference reads MOBPY_* env vars,
        MOBPY/config.py:145-221): MOBRAY_EPSILON, MOBRAY_TARGET_BATCH_SIZE,
        MOBRAY_DECODE_BATCH_BYTES, MOBRAY_NUM_BUCKETS."""
        import os

        kwargs = {}
        casts = {
            "epsilon": float,
            "target_batch_size": int,
            "decode_batch_bytes": int,
            "num_buckets": int,
        }
        for name, cast in casts.items():
            raw = os.environ.get(prefix + name.upper())
            if raw is not None:
                kwargs[name] = cast(raw)
        return EngineConfig(**kwargs)


DEFAULT_CONFIG = EngineConfig()
