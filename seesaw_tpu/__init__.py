"""seesaw_tpu: a TPU-native interactive image-database search engine.

A from-scratch rebuild of the capabilities of orm011/seesaw (relevance-feedback
image search over multiscale CLIP patch embeddings), designed TPU-first:

- embedding, scoring, top-k, kNN-graph construction, label propagation and the
  per-round feedback fits run as jit/pjit-compiled JAX/XLA programs (with Pallas
  kernels on the hot paths) over device-resident embedding shards;
- the session/serving layer is thin single-process Python (no actor RPC);
- storage is parquet/npz feeding device arrays.

Public API mirrors the reference's `seesaw` package contracts (AccessMethod,
LoopBase, Session, SessionParams, benchmark harness) so that workloads written
against the reference carry over. See SURVEY.md for the component map.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep bare import light (no jax/pandas pull)
    if name == "GlobalDataManager":
        from .dataset import GlobalDataManager

        return GlobalDataManager
    if name == "make_session":
        from .session import make_session

        return make_session
    if name == "load_embedding":
        from .models.registry import load_embedding

        return load_embedding
    raise AttributeError(name)


from .basic_types import (  # noqa: F401
    Box,
    Annotation,
    ActivationData,
    Interval,
    Imdata,
    IndexSpec,
    SessionParams,
    LogEntry,
    SessionState,
    BenchParams,
    BenchResult,
    BenchSummary,
    is_image_accepted,
    get_constructor,
)
