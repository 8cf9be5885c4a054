"""Semantic end-to-end: a trained CLIP checkpoint drives real text->image
search through the ENTIRE stack.

The real pretrained weights can't exist in this offline image, so this test
manufactures semantics: it contrastively trains the tiny CLIP variant on
synthetic (color image, color caption) pairs with our own fine-tuning
trainer, exports the checkpoint as a registry artifact, ingests actual PNG
files with it (decode -> multiscale tiling -> encode -> index), runs a text
session, and checks the searcher actually finds the right category — the
reference's quality story (BASELINE.md) exercised end to end with a working
checkpoint. (Training loss plateaus at ~ln(batch/3): in-batch same-color
duplicates set that floor, so alignment — not loss — is the success metric.)
"""
import json
import os

import numpy as np
import PIL.Image
import pytest

COLORS = {"red": 0, "green": 1, "blue": 2}


def _color_image(rng, color: str, hw=(64, 64)) -> np.ndarray:
    img = rng.integers(0, 60, size=(*hw, 3), dtype=np.uint8)
    img[..., COLORS[color]] = rng.integers(170, 255, size=hw, dtype=np.uint8)
    return img


def _clip_pixels(imgs_u8: np.ndarray) -> np.ndarray:
    from seesaw_tpu.models.preprocess import normalize_pixels

    return np.asarray(normalize_pixels(imgs_u8.astype(np.float32) / 255.0))


@pytest.fixture(scope="module")
def trained_artifact(tmp_path_factory):
    from seesaw_tpu.models.clip import (
        ClipEmbedding, VARIANTS, config_to_info, save_params_npz,
    )
    from seesaw_tpu.models.clip_finetune import CLIPFineTuner
    from seesaw_tpu.models.tokenizer import HashTokenizer

    cfg = VARIANTS["test"]
    tok = HashTokenizer(cfg.context_length, cfg.vocab_size)
    emb = ClipEmbedding(variant="test", tokenizer=tok)

    rng = np.random.default_rng(0)
    n = 240
    colors = [list(COLORS)[i % 3] for i in range(n)]
    pixels = _clip_pixels(np.stack([_color_image(rng, c, (32, 32)) for c in colors]))
    # half bare captions (the query phrasing), half with distinct filler so
    # in-batch negatives differ
    caps = [
        f"a {c} image" if i % 2 == 0 else f"a {c} image sample{i}"
        for i, c in enumerate(colors)
    ]
    tokens = np.stack([tok.encode(s) for s in caps])

    tuner = CLIPFineTuner(
        emb, dict(opt_config={"": {"lr": 5e-3, "weight_decay": 0.0}})
    )
    tuner.fit(pixels, tokens, epochs=40, batch_size=24, seed=0)
    assert tuner.losses[-1] < tuner.losses[0] - 1.0  # towards the dup floor

    out = tmp_path_factory.mktemp("sem_artifact")
    save_params_npz(tuner.params, str(out / "params.npz"))
    info = config_to_info(cfg)
    info["variant"] = "test"
    (out / "info.json").write_text(json.dumps(info))
    return out


def test_trained_model_aligns_text_and_images(trained_artifact):
    from seesaw_tpu.models.clip import ClipEmbedding

    emb = ClipEmbedding.from_artifact(str(trained_artifact))
    rng = np.random.default_rng(7)
    mean_vec = {}
    for c in COLORS:
        px = _clip_pixels(np.stack([_color_image(rng, c, (32, 32)) for _ in range(8)]))
        v = np.array(emb.encode_image_batch(px))
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        mean_vec[c] = v.mean(axis=0)

    for c in COLORS:
        q = emb.from_string(string=f"a {c} image")
        sims = {c2: float(q @ mean_vec[c2]) for c2 in COLORS}
        best = max(sims, key=sims.get)
        assert best == c, f"query {c!r} retrieved {best!r}: {sims}"


def test_full_semantic_search_session(trained_artifact, tmp_path):
    """PNGs on disk -> ingest with the trained checkpoint -> text session
    finds the right color far above the base rate."""
    import pandas as pd

    from seesaw_tpu.basic_types import BenchParams, IndexSpec, SessionParams
    from seesaw_tpu.bench.harness import benchmark_loop
    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.ingest.pipeline import create_multiscale_index
    from seesaw_tpu.labeldb import BoxTable
    from seesaw_tpu.runtime.bitmap import FrozenBitMap
    from seesaw_tpu.session import make_session

    rng = np.random.default_rng(3)
    root = tmp_path / "root"
    gdm = GlobalDataManager(str(root))

    n = 45
    colors = [list(COLORS)[i % 3] for i in range(n)]
    paths = [f"img_{i:03d}.png" for i in range(n)]
    ds = gdm.create_dataset("semantic", paths=paths)
    for i in range(n):
        fp = ds.file_path(i)
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        PIL.Image.fromarray(_color_image(rng, colors[i])).save(fp)

    red_idx = np.array([i for i, c in enumerate(colors) if c == "red"])
    gt = BoxTable(
        dbidx=red_idx.astype(np.int32),
        boxes=np.tile(np.array([[0, 0, 64, 64]], np.float32), (len(red_idx), 1)),
        description=["red"] * len(red_idx),
        marked_accepted=np.ones(len(red_idx), bool),
    )
    qgt = pd.DataFrame({"red": np.isin(np.arange(n), red_idx).astype(np.float32)})
    ds.save_ground_truth(gt, qgt)

    create_multiscale_index(
        ds, "multiscale", f"clip-test:{trained_artifact}",
        tile_size=32, factor=0.5, min_tile_size=32, batch_size=64,
    )

    p = SessionParams(
        index_spec=IndexSpec(d_name="semantic", i_name="multiscale"),
        interactive="plain", batch_size=3, shortlist_size=15,
    )
    b = BenchParams(name="sem", ground_truth_category="red",
                    qstr="a red image", n_batches=5, max_results=10,
                    query_template="{}")
    ret = make_session(gdm, p, b=b)
    dset = ret["dataset"]
    box_table, _ = dset.load_ground_truth()
    info = benchmark_loop(session=ret["session"], subset=FrozenBitMap(dset.dbidxs),
                          box_table=box_table, b=b, p=p)
    precision = info["nfound"] / info["nseen"]
    base_rate = len(red_idx) / n  # 1/3
    assert precision > 0.8, f"semantic search precision {precision} (base {base_rate})"
