"""ICP parameter sets (reference ``src/icp/icp_params.rs``).

Frozen dataclasses — hashable, so they are static under ``jit`` and each
parameter set compiles once. Defaults replicate the reference exactly (these
numbers are reproducibility-critical: they produced the published ATE).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Iterator


@dataclasses.dataclass(frozen=True)
class IcpParams:
    """Per-level knobs (icp_params.rs:8-43)."""

    max_iterations: int = 15
    weight: float = 1.0
    color_weight: float = 0.1
    max_point_to_plane_distance: float = 0.1
    max_distance: float = 0.5
    max_normal_angle: float = math.radians(18.0)
    max_color_distance: float = 0.25
    # Huber robust weighting — present-but-unwired in the reference
    # (robust_estimator.rs); default off for parity.
    huber_delta: float | None = None
    # Compute engine: "xla" = exact projective association via packed XLA
    # gathers (works for any displacement); "pallas" = fused banded-gather
    # TPU kernel (align3d_tpu/ops/icp_pallas_v3.py) — ~30x faster per iteration,
    # association limited to a tracked displacement band, so use it on fine
    # pyramid levels where coarse levels have already removed bulk motion.
    engine: str = "xla"
    # Pallas engine only: candidate-row radius of the banded association
    # (pixels whose correspondence row deviates more than this from the
    # per-group tracked prediction are dropped). 1 covers the per-chunk
    # row-displacement spread once coarse levels have removed bulk motion
    # and meets the reference accuracy bars on the sample sequences
    # (tests/test_icp.py); raise to 2 for larger inter-frame motion at
    # ~1.5x the per-iteration cost.
    band_radius: int = 1

    def replace(self, **kw) -> "IcpParams":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class MsIcpParams:
    """Per-pyramid-level parameter list, fine -> coarse (icp_params.rs:59-134)."""

    pyramid: tuple[IcpParams, ...]

    @classmethod
    def repeat(cls, levels: int, params: IcpParams) -> "MsIcpParams":
        return cls(tuple(params for _ in range(levels)))

    def customize(self, fn: Callable[[int, IcpParams], IcpParams]) -> "MsIcpParams":
        return MsIcpParams(tuple(fn(i, p) for i, p in enumerate(self.pyramid)))

    @classmethod
    def default(cls) -> "MsIcpParams":
        """3 levels; weight 1.0, color_weight 1.0, max_normal_angle pi/10,
        max_color_distance 2.75, max_distance 0.5; iterations 20/20/30
        fine -> coarse (icp_params.rs:112-134)."""
        base = IcpParams(
            weight=1.0,
            color_weight=1.0,
            max_normal_angle=math.pi / 10.0,
            max_color_distance=2.75,
            max_distance=0.5,
        )
        iters = {0: 20, 1: 20, 2: 30}
        return cls.repeat(3, base).customize(
            lambda i, p: p.replace(max_iterations=iters.get(i, p.max_iterations))
        )

    @classmethod
    def default_tpu(
        cls, engine: str = "pallas", coarse_exact: bool = False
    ) -> "MsIcpParams":
        """The reference defaults with a fused Pallas engine at every level.
        ``engine`` picks the kernel: "pallas" (v3, f32 target pack) or
        "pallas_v4" (slim int pack + bf16 reduction, fastest). The coarsest
        level handles the bulk inter-frame motion, so it gets candidate-row
        radius 2 (the per-chunk displacement spread before any alignment);
        the finer levels keep radius 1 (profiled e2e split: the coarse level
        on the XLA engine was 83% of the pipeline, tools/profile_e2e.py).

        **Motion-regime limit**: the banded association re-predicts its band
        base every iteration but only considers candidate rows within the
        radius, so per-group displacement spread beyond radius 2 (+ the 8-row
        halo) at the coarsest level — e.g. several degrees of inter-frame
        rotation — silently drops correspondences. For fast motion pass
        ``coarse_exact=True`` to keep the exact XLA association at the
        coarsest level (arbitrary displacement) and the Pallas kernel on the
        finer levels (tests/test_icp.py::test_default_tpu_large_rotation
        pins both regimes)."""
        base = cls.default()
        n = len(base)
        return base.customize(
            lambda i, p: p.replace(
                engine="xla" if (coarse_exact and i == n - 1) else engine,
                band_radius=2 if i == n - 1 else 1,
            )
        )

    def __len__(self) -> int:
        return len(self.pyramid)

    def __getitem__(self, i: int) -> IcpParams:
        return self.pyramid[i]

    def __iter__(self) -> Iterator[IcpParams]:
        return iter(self.pyramid)
