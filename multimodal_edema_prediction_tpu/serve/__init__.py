"""Online serving subsystem: dynamic micro-batching over AOT-warmed jitted
eval steps, exposed through a dependency-free JSON/HTTP server.

The reference ships no serving path at all (its ``inference.py`` is
gitignored — SURVEY §1); this subsystem is the production-deployment
surface the reference lacks, built TPU-first: fixed shape buckets so XLA
compiles a bounded executable set, one consumer thread owning the device,
pixel/bank/feature-cache image tiers shared with training.
"""
from .predictor import BatchingPredictor, PredictorStats, QueueFullError
from .server import make_server, serve_forever

__all__ = ["BatchingPredictor", "PredictorStats", "QueueFullError",
           "make_server", "serve_forever"]
