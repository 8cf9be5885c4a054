"""Textual feedback: OnlineModel training (linear + finetune) and the loop
end-to-end on a CLIP-test index."""
import numpy as np
import pandas as pd
import pytest

from seesaw_tpu.models.clip import ClipEmbedding
from seesaw_tpu.models.online_model import OnlineModel, deduplicate_strings


@pytest.fixture(scope="module")
def emb():
    return ClipEmbedding(variant="test")


def make_feedback(emb, rng, n=24):
    """Half the vectors near the 'dog' direction (accepted), half near 'cat'
    (rejected, annotated with the cat string)."""
    vdog = emb.from_string(string="a dog")
    vcat = emb.from_string(string="a cat")
    vecs, acc, ann = [], [], []
    for i in range(n):
        if i % 2 == 0:
            v = vdog + 0.4 * rng.normal(size=emb.dim)
            acc.append(True)
            ann.append("a dog")
        else:
            v = vcat + 0.4 * rng.normal(size=emb.dim)
            acc.append(False)
            ann.append("a cat")
        vecs.append(v / np.linalg.norm(v))
    return (
        np.stack(vecs).astype(np.float32),
        np.array(acc),
        np.array(ann, dtype=object),
    )


def test_deduplicate_strings():
    d = deduplicate_strings(["a", "b", "a", "c", "b"])
    assert d["strings"] == ["a", "b", "c"]
    assert d["indices"].tolist() == [0, 1, 0, 2, 1]


def test_linear_mode_separates(emb):
    rng = np.random.default_rng(0)
    vecs, acc, ann = make_feedback(emb, rng)
    model = OnlineModel(emb, dict(mode="linear", rounds=30, num_warmup_steps=4,
                                  image_loss_weight=0.5, rank_margin=0.1))
    model.update(vecs, acc, ann, target_string="a dog")
    scores = model.score_vecs(vecs)
    assert scores[acc].mean() > scores[~acc].mean() + 0.05
    assert (scores >= 0).all() and (scores <= 1).all()  # softmax probs
    # losses recorded and finite
    assert len(model.losses) > 0 and np.isfinite(model.losses).all()


def test_finetune_mode_improves(emb):
    rng = np.random.default_rng(1)
    vecs, acc, ann = make_feedback(emb, rng)
    model = OnlineModel(emb, dict(mode="finetune", rounds=25, lr=5e-3,
                                  image_loss_weight=0.5, rank_margin=0.1,
                                  label_margin=0.1))
    before = model.encode_string("a dog")
    P_before = model.text_projection.copy()
    model.update(vecs, acc, ann, target_string="a dog")
    after = model.encode_string("a dog")
    assert not np.allclose(model.text_projection, P_before)
    assert not np.allclose(before, after)
    # tuned target vector ranks accepted higher
    scores = model.score_vecs(vecs)
    assert scores[acc].mean() > scores[~acc].mean()
    assert model.losses[-1] <= model.losses[0] + 1e-6


def test_reset_clears_tuning(emb):
    rng = np.random.default_rng(2)
    vecs, acc, ann = make_feedback(emb, rng, n=8)
    model = OnlineModel(emb, dict(mode="finetune", rounds=5, lr=1e-2))
    base = model.encode_string("a dog")
    model.update(vecs, acc, ann, target_string="a dog")
    model.reset()
    np.testing.assert_allclose(model.encode_string("a dog"), base, atol=1e-6)


def test_textual_loop_e2e(tmp_path):
    """Full session loop with box descriptions driving the linear model."""
    from seesaw_tpu.basic_types import BenchParams, IndexSpec, SessionParams
    from seesaw_tpu.bench import harness
    from seesaw_tpu.bench.harness import benchmark_loop
    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.indices.meta import VectorMeta
    from seesaw_tpu.indices.multiscale import MultiscaleIndex
    from seesaw_tpu.labeldb import BoxTable
    from seesaw_tpu.runtime.bitmap import FrozenBitMap
    from seesaw_tpu.session import make_session

    e = ClipEmbedding(variant="test")
    rng = np.random.default_rng(3)
    n_images = 30
    vdog = e.from_string(string="a dog")

    dbidx, zoom, boxes, vecs = [], [], [], []
    gt_rows = []
    is_pos = rng.random(n_images) < 0.3
    for i in range(n_images):
        for t, (x1, y1) in enumerate([(0, 0), (112, 0), (0, 112), (112, 112)]):
            v = rng.normal(size=e.dim)
            if is_pos[i] and t == 0:
                v = vdog + 0.3 * v
            v = v / np.linalg.norm(v)
            dbidx.append(i)
            zoom.append(1)
            boxes.append((x1, y1, x1 + 112, y1 + 112))
            vecs.append(v)
        if is_pos[i]:
            gt_rows.append((i, 0.0, 0.0, 112.0, 112.0))

    meta, order = VectorMeta.from_arrays(
        np.array(dbidx), np.array(zoom), np.array(boxes, np.float32)
    )
    V = np.stack(vecs).astype(np.float32)[order]

    gdm = GlobalDataManager(str(tmp_path))
    ds = gdm.create_dataset("tex", paths=[f"i{i}.jpg" for i in range(n_images)])
    idx = MultiscaleIndex(embedding=e, vectors=V, meta=meta)
    idx.save(ds.index_path("ms"), model_name="clip-test")
    gt = BoxTable(
        dbidx=np.array([r[0] for r in gt_rows], dtype=np.int32),
        boxes=np.array([r[1:] for r in gt_rows], dtype=np.float32),
        description=["dog"] * len(gt_rows),
        marked_accepted=np.ones(len(gt_rows), dtype=bool),
    )
    qgt = pd.DataFrame({"dog": is_pos.astype(np.float32)})
    ds.save_ground_truth(gt, qgt)

    p = SessionParams(
        index_spec=IndexSpec(d_name="tex", i_name="ms"),
        interactive="textual",
        batch_size=3,
        shortlist_size=10,
        interactive_options=dict(
            mode="linear", rounds=10, num_warmup_steps=2,
            image_loss_weight=0.5, rank_margin=0.1, vector_box_min_iou=0.1,
        ),
    )
    b = BenchParams(
        name="tex", ground_truth_category="dog", qstr="a dog",
        n_batches=6, max_results=5, provide_textual_feedback=True,
    )
    ret = make_session(gdm, p, b=b)
    box_table, _ = ret["dataset"].load_ground_truth()
    info = benchmark_loop(
        session=ret["session"], subset=FrozenBitMap(ds.dbidxs),
        box_table=box_table, b=b, p=p,
    )
    assert info["nseen"] > 0


def test_computed_image_vector_strategy(tmp_path):
    """'computed' strategy: square crops around labeled boxes embedded with
    the index's CLIP model."""
    import PIL.Image
    from seesaw_tpu.basic_types import Box, IndexSpec, SessionParams
    from seesaw_tpu.dataset import GlobalDataManager
    from seesaw_tpu.ingest.pipeline import create_multiscale_index
    from seesaw_tpu.loops.textual import TextualFeedback, compute_box_vectors
    from seesaw_tpu.query_interface import InteractiveQuery

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        arr = (rng.random((80, 96, 3)) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(img_dir / f"i{i}.png")
    gdm = GlobalDataManager(str(tmp_path / "root"))
    ds = gdm.create_dataset("cimg", image_src=str(img_dir))
    idx = create_multiscale_index(ds, "ms", "clip-test", tile_size=32,
                                  min_tile_size=32, batch_size=8, force=True)

    boxes = [Box(x1=10, y1=10, x2=50, y2=40, description="a cat",
                 marked_accepted=False)]
    vecs, descs, acc = compute_box_vectors(idx, ds, 0, boxes)
    assert vecs.shape == (1, idx.embedding.dim)
    assert np.isfinite(vecs).all()
    assert descs[0] == "a cat" and acc[0] == False  # noqa: E712

    # loop wiring: refine with computed vectors runs end to end
    p = SessionParams(
        index_spec=IndexSpec(d_name="cimg", i_name="ms"),
        interactive="textual", batch_size=2, shortlist_size=4,
        image_vector_strategy="computed",
        interactive_options=dict(mode="linear", rounds=4, num_warmup_steps=1,
                                 image_loss_weight=0.5, rank_margin=0.1),
    )
    q = idx.new_query()
    loop = TextualFeedback(gdm, q, p)
    loop.state.curr_str = "a dog"
    loop.set_text_vec(idx.string2vec("a dog"))
    q.label_db.put(0, boxes)
    q.label_db.put(1, [Box(x1=5, y1=5, x2=60, y2=60, description="a dog",
                           marked_accepted=True)])
    loop.refine()
    assert loop._updated
    out = loop.next_batch()
    assert len(out["dbidxs"]) > 0
