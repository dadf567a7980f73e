"""Evaluation subsystem (SURVEY.md §6/§7 layer 8): the reference publishes
no quantitative metrics, but BASELINE.json's acceptance criterion is "FID
parity", so the rebuild ships its own FID evaluator."""

from gea.eval.fid import (  # noqa: F401
    FIDStats,
    compute_fid,
    frechet_distance,
    make_feature_extractor,
)
