"""Serving soak: many concurrent sessions against ONE shared index for many
rounds — device-memory stability (exclusion-mask LRU, weight/layout caches),
lock liveness, and result isolation (VERDICT r4 next #7; reference
`web/session_manager.py:46-54` actor-per-session semantics, here replaced by
per-session objects + locks over a process-shared index)."""
import threading

import numpy as np
import pytest

from seesaw_tpu.basic_types import Box, IndexSpec, SessionParams
from seesaw_tpu.dataset import GlobalDataManager
from seesaw_tpu.session import make_session

from synth import build_synthetic_root, QSTR

N_SESSIONS = 6
ROUNDS = 40  # x N_SESSIONS x batch 3 = 720 served images / run


@pytest.fixture(scope="module")
def soak_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("soak_root")
    build_synthetic_root(
        str(root), dataset_name="soak", n_images=620, pos_frac=0.2
    )
    return str(root)


def _params(method, opts=None):
    return SessionParams(
        index_spec=IndexSpec(d_name="soak", i_name="multiscale"),
        interactive=method, batch_size=3, shortlist_size=20,
        agg_method="avg_score", aug_larger="all",
        interactive_options=opts or {},
        index_options={"coalesce_ms": 5.0},
    )


@pytest.mark.slow
def test_soak_concurrent_sessions(soak_root):
    gdm = GlobalDataManager(soak_root)
    methods = ["plain", "rocchio_update", "log_reg2"] * 2
    opts = {
        "rocchio_update": dict(rocchio_alpha=1.0, rocchio_beta=0.7,
                               rocchio_gamma=0.3),
        "log_reg2": dict(class_weights="balanced", scale="centered",
                         reg_lambda=5.0, fit_intercept=False, max_iter=30),
    }
    sessions = [
        make_session(gdm, _params(m, opts.get(m)))["session"]
        for m in methods
    ]
    # every session shares ONE coalescing index over one inner index
    inner = {id(getattr(s.index, "_inner", s.index)) for s in sessions}
    assert len(inner) == 1, "sessions must share one index object"
    idx = getattr(sessions[0].index, "_inner", sessions[0].index)

    import jax

    rng = np.random.default_rng(0)
    results: dict = {}
    errors: list = []

    def drive(si, session):
        try:
            session.set_text(QSTR)
            got = []
            r = np.random.default_rng(si)
            for _ in range(ROUNDS):
                batch = session.next()
                got.extend(int(x) for x in batch)
                state = session.get_state()
                for im in state.gdata[-1]:
                    if r.random() < 0.25:
                        im.boxes = [Box(x1=0.0, y1=0.0, x2=112.0, y2=112.0,
                                        marked_accepted=True)]
                    else:
                        im.boxes = []
                session.update_state(state)
                session.refine()
            results[si] = got
        except Exception as e:  # pragma: no cover - the assert below reports
            errors.append((si, repr(e)))

    n_live_before = len(jax.live_arrays())
    threads = [
        threading.Thread(target=drive, args=(i, s))
        for i, s in enumerate(sessions)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not any(t.is_alive() for t in threads), "soak deadlocked"
    assert not errors, f"sessions crashed: {errors}"

    # result isolation: every session served its full quota with no repeats
    for si in range(N_SESSIONS):
        got = results[si]
        assert len(got) == ROUNDS * 3
        assert len(set(got)) == len(got), f"session {si} repeated a dbidx"

    # device-memory stability: the exclusion LRU is bounded and live device
    # arrays did not grow past (bounded caches + per-session masks)
    assert len(idx._excl_entries) <= idx._EXCL_CACHE
    n_live_after = len(jax.live_arrays())
    assert n_live_after - n_live_before < 400, (
        f"device arrays grew {n_live_before} -> {n_live_after}"
    )

    # a second soak wave over the SAME index reuses the caches (no monotonic
    # growth across waves — the long-running-server property)
    wave2 = [
        make_session(gdm, _params("plain"))["session"] for _ in range(3)
    ]
    threads = [
        threading.Thread(target=drive, args=(100 + i, s))
        for i, s in enumerate(wave2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, f"wave-2 sessions crashed: {errors}"
    n_live_wave2 = len(jax.live_arrays())
    assert n_live_wave2 - n_live_after < 200, (
        f"device arrays kept growing {n_live_after} -> {n_live_wave2}"
    )
    assert len(idx._excl_entries) <= idx._EXCL_CACHE
