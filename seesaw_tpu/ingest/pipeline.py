"""Extraction pipeline: dataset images -> multiscale CLIP vectors -> index.

Replaces the reference's Ray Data pipeline (`multiscale_tools.py:208-253`)
with a thread-pool decode/tile stage feeding fixed-size jit-compiled ViT
batches on device (one compile per bucket shape). On a multi-chip mesh the
batch axis is sharded (data-parallel inference); on one chip batches stream
back-to-back so the MXU stays busy while the CPU pool decodes ahead.
"""
from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Optional

import numpy as np
import PIL.Image

from ..dataset import SeesawDataset
from ..utils.transactional import transactional_folder
from .tiling import generate_multiscale_tiling

_SENTINEL = object()
_STAGE_ERROR = object()  # (_STAGE_ERROR, exc): a stage died; consumer raises

_u8_to_clip = None  # jitted lazily (jax import cost)


def _get_u8_to_clip():
    """uint8 tiles -> CLIP-normalized f32 on device: tiles cross host->device
    as uint8 (4x less transfer); /255 + normalization fuse into one op."""
    global _u8_to_clip
    if _u8_to_clip is None:
        import jax
        import jax.numpy as jnp

        from ..models.preprocess import normalize_pixels

        _u8_to_clip = jax.jit(
            lambda u8: normalize_pixels(u8.astype(jnp.float32) / 255.0)
        )
    return _u8_to_clip


def _encode_tiles_batched(embedding, tiles_u8: np.ndarray, batch_size: int,
                          mesh=None) -> np.ndarray:
    """Normalize + encode uint8 tiles in fixed-size padded batches.

    With a mesh, the batch axis is sharded across devices (data-parallel
    inference: each chip encodes batch_size/n_devices tiles per step — the
    v5e-8 embed-1M-images path)."""
    import jax
    import jax.numpy as jnp

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        batch_size = -(-batch_size // n_dev) * n_dev
        sharding = NamedSharding(mesh, P("data"))
    else:
        sharding = None

    n = tiles_u8.shape[0]
    out = np.empty((n, embedding.dim), dtype=np.float32)
    # 2-deep software pipeline: dispatch is async, so batch i+1's host->device
    # transfer overlaps batch i's ViT compute; materialize one batch behind
    pending = None  # (device_vecs, lo, hi)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        batch = np.zeros((batch_size,) + tiles_u8.shape[1:], dtype=np.uint8)
        batch[: hi - lo] = tiles_u8[lo:hi]
        px = jnp.asarray(batch)
        if sharding is not None:
            px = jax.device_put(px, sharding)
        px = _get_u8_to_clip()(px)
        vecs_d = embedding.encode_image_batch(px)
        if pending is not None:
            pvecs, plo, phi = pending
            out[plo:phi] = np.asarray(pvecs)[: phi - plo]
        pending = (vecs_d, lo, hi)
    if pending is not None:
        pvecs, plo, phi = pending
        out[plo:phi] = np.asarray(pvecs)[: phi - plo]
    norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-6)
    return out / norms


def run_multiscale_extraction(
    ds: SeesawDataset,
    embedding,
    *,
    tile_size: int = 224,
    factor: float = 0.5,
    min_tile_size: int = 224,
    batch_size: int = 256,
    n_decode_threads: int = 8,
    limit: Optional[int] = None,
    mesh=None,
    tiling: str = "host",
):
    """Returns (vectors (N,D), dbidx, zoom_level, boxes) sorted by dbidx.

    tiling='device' moves the pyramid+grid extraction into a jitted XLA
    program (ingest/device_tiling.py): the host only decodes JPEGs, the raw
    image is the only host->device transfer, and tiles stay device-resident
    through the ViT. Host tiling remains the default for hosts without a
    device attached."""
    if tiling == "device":
        return _run_device_tiling_extraction(
            ds, embedding, tile_size=tile_size, factor=factor,
            min_tile_size=min_tile_size, batch_size=batch_size,
            n_decode_threads=n_decode_threads, limit=limit,
        )
    dbidxs = ds.dbidxs[:limit] if limit else ds.dbidxs

    work_q: "queue.Queue" = queue.Queue(maxsize=n_decode_threads * 2)

    def decode_one(dbidx):
        try:
            im = PIL.Image.open(ds.file_path(int(dbidx)))
            ts = generate_multiscale_tiling(
                im, tile_size=tile_size, factor=factor, min_tile_size=min_tile_size
            )
            return (int(dbidx), ts)
        except Exception as e:  # unreadable/missing/truncated image: skip
            print(f"warning: cannot decode image for dbidx={dbidx} ({e!r}); skipping")
            return None

    def producer():
        # ANY exit enqueues a terminal item: a producer dying without one
        # would leave the consumer blocked on work_q.get() forever
        try:
            with ThreadPoolExecutor(n_decode_threads) as pool:
                for res in pool.map(decode_one, dbidxs):
                    work_q.put(res)
        except BaseException as e:  # noqa: BLE001 — surfaced by the consumer
            work_q.put((_STAGE_ERROR, e))
        else:
            work_q.put(_SENTINEL)

    threading.Thread(target=producer, daemon=True).start()

    # cross-image batching: tiles from many images fill each fixed-size
    # device batch exactly (per-image batches would waste most of the batch
    # on padding — images yield ~10 tiles, batches are 256)
    all_vecs, all_dbidx, all_zoom, all_boxes = [], [], [], []
    buf_tiles, buf_meta = [], []  # aligned per-tile buffers
    n_buf = 0

    def flush(final=False):
        nonlocal buf_tiles, buf_meta, n_buf
        while n_buf >= batch_size or (final and n_buf > 0):
            tiles = np.concatenate(buf_tiles) if len(buf_tiles) > 1 else buf_tiles[0]
            take = min(batch_size, n_buf)
            vecs = _encode_tiles_batched(
                embedding, tiles[:take], batch_size, mesh=mesh
            )
            dbidx_a, zoom_a, boxes_a = (
                np.concatenate([m[i] for m in buf_meta]) for i in range(3)
            )
            all_vecs.append(vecs)
            all_dbidx.append(dbidx_a[:take])
            all_zoom.append(zoom_a[:take])
            all_boxes.append(boxes_a[:take])
            buf_tiles = [tiles[take:]] if take < tiles.shape[0] else []
            buf_meta = (
                [(dbidx_a[take:], zoom_a[take:], boxes_a[take:])]
                if take < dbidx_a.shape[0] else []
            )
            n_buf -= take

    while True:
        item = work_q.get()
        if item is _SENTINEL:
            break
        if item is None:
            continue
        if isinstance(item, tuple) and item[0] is _STAGE_ERROR:
            raise RuntimeError("ingest decode stage failed") from item[1]
        dbidx, ts = item
        n_tiles = ts.tiles.shape[0]
        buf_tiles.append(ts.tiles)
        buf_meta.append(
            (np.full(n_tiles, dbidx, dtype=np.int32), ts.zoom_level, ts.boxes)
        )
        n_buf += n_tiles
        flush()
    flush(final=True)

    if not all_vecs:
        raise RuntimeError(
            "extraction produced zero vectors: no image decoded successfully"
        )
    vectors = np.concatenate(all_vecs)
    dbidx = np.concatenate(all_dbidx)
    zoom = np.concatenate(all_zoom)
    boxes = np.concatenate(all_boxes)
    order = np.argsort(dbidx, kind="stable")
    return vectors[order], dbidx[order], zoom[order], boxes[order]


def _run_device_tiling_extraction(
    ds, embedding, *, tile_size, factor, min_tile_size, batch_size,
    n_decode_threads, limit, img_batch: int = 48,
):
    """Decode on host threads (native C++ libjpeg pool when available, PIL
    otherwise); tile + normalize + encode on device. Tiles never return to
    the host — device buffers concatenate into exact fixed-size ViT
    batches.

    Images are grouped by resolution and tiled `img_batch` per dispatch
    (device_tiling.build_batch_tiler): one contiguous (B, H, W, 3) uint8
    upload + one program per group amortizes the link's per-dispatch
    round-trip B-fold — through a high-latency tunnel this is the
    difference between ~10 and >100 img/s steady state."""
    import jax.numpy as jnp

    from ..runtime.jpeg_decode import decode_pool
    from .device_tiling import build_batch_tiler, build_tiler, make_plan

    dbidxs = ds.dbidxs[:limit] if limit else ds.dbidxs
    work_q: "queue.Queue" = queue.Queue(maxsize=n_decode_threads * 2)
    paths = [ds.file_path(int(i)) for i in dbidxs]
    jpeg_only = all(str(p).lower().endswith((".jpg", ".jpeg")) for p in paths)

    def decode_pil(i):
        try:
            im = PIL.Image.open(paths[i])
            if im.mode != "RGB":
                im = im.convert("RGB")
            return i, np.asarray(im)
        except Exception:
            return i, None

    def producer():
        # ANY exit enqueues a terminal item (a dead producer would leave
        # the uploader blocked on work_q.get() forever)
        try:
            if jpeg_only:
                it = decode_pool(paths, n_threads=n_decode_threads)
            else:
                pool = ThreadPoolExecutor(n_decode_threads)
                it = pool.map(decode_pil, range(len(paths)))
            for i, img in it:
                if img is None:
                    print(f"warning: cannot decode image for dbidx={dbidxs[i]}; skipping")
                    continue
                work_q.put((int(dbidxs[i]), img))
        except BaseException as e:  # noqa: BLE001 — forwarded to the main thread
            work_q.put((_STAGE_ERROR, e))
        else:
            work_q.put(_SENTINEL)

    threading.Thread(target=producer, daemon=True).start()

    all_vecs, all_dbidx, all_zoom, all_boxes = [], [], [], []
    buf_tiles = []  # device arrays, CLIP-normalized
    buf_meta = []  # aligned (dbidx, zoom, boxes) numpy
    n_buf = 0
    pending = None  # (device_vecs, n_valid) one batch behind

    def materialize():
        nonlocal pending
        if pending is not None:
            pvecs, n_valid = pending
            all_vecs.append(np.asarray(pvecs)[:n_valid])
            pending = None

    def flush(final=False):
        nonlocal buf_tiles, buf_meta, n_buf, pending
        while n_buf >= batch_size or (final and n_buf > 0):
            cat = buf_tiles[0] if len(buf_tiles) == 1 else jnp.concatenate(buf_tiles)
            take = min(batch_size, n_buf)
            block = cat[:take]
            if take < batch_size:  # final partial batch: pad to shape bucket
                block = jnp.pad(block, ((0, batch_size - take), (0, 0), (0, 0), (0, 0)))
            vecs_d = embedding.encode_image_batch(block)
            dbidx_a, zoom_a, boxes_a = (
                np.concatenate([m[i] for m in buf_meta]) for i in range(3)
            )
            materialize()
            pending = (vecs_d, take)
            all_dbidx.append(dbidx_a[:take])
            all_zoom.append(zoom_a[:take])
            all_boxes.append(boxes_a[:take])
            buf_tiles = [cat[take:]] if take < n_buf else []
            buf_meta = (
                [(dbidx_a[take:], zoom_a[take:], boxes_a[take:])]
                if take < dbidx_a.shape[0] else []
            )
            n_buf -= take

    # UPLOADER stage on its own thread: per-resolution grouping, the
    # (B,H,W,3) stack, the host->device upload and the tiler dispatch all
    # overlap with the main thread's encode/materialize — through a
    # high-latency link the upload is the binding stage, so it must never
    # wait behind the ViT
    tiles_q: "queue.Queue" = queue.Queue(maxsize=2)

    # decoded images waiting for a full same-resolution group are capped:
    # heterogeneous-resolution datasets would otherwise buffer nearly every
    # decoded frame (several MB each) until end-of-stream
    max_buffered_bytes = 1 << 30

    def uploader():
        groups: dict = {}  # (h, w) -> (plan, [dbidx...], [img...])
        buffered = 0

        def emit_group(plan, g_dbidx, g_imgs):
            B = len(g_imgs)
            if B == img_batch:
                tiles_d = build_batch_tiler(plan, img_batch)(
                    jnp.asarray(np.stack(g_imgs))
                )
                tiles_q.put((tiles_d, [(d, plan) for d in g_dbidx]))
            else:  # leftover tail group: per-image dispatches
                for d, img in zip(g_dbidx, g_imgs):
                    tiles_q.put((build_tiler(plan)(jnp.asarray(img)), [(d, plan)]))

        def pop_and_emit(key):
            nonlocal buffered
            plan, g_dbidx, g_imgs = groups.pop(key)
            buffered -= sum(im.nbytes for im in g_imgs)
            emit_group(plan, g_dbidx, g_imgs)

        try:
            while True:
                item = work_q.get()
                if item is _SENTINEL:
                    break
                if item is None:
                    continue
                if isinstance(item, tuple) and item[0] is _STAGE_ERROR:
                    tiles_q.put(item)  # forward the decode-stage failure
                    return
                dbidx, img = item
                h, w = img.shape[:2]
                plan = make_plan(h, w, tile_size, factor, min_tile_size)
                g = groups.setdefault((h, w), (plan, [], []))
                g[1].append(dbidx)
                g[2].append(img)
                buffered += img.nbytes
                if len(g[1]) >= img_batch:
                    pop_and_emit((h, w))
                while buffered > max_buffered_bytes and groups:
                    # flush the fullest partial group (per-image dispatches)
                    pop_and_emit(max(groups, key=lambda k: len(groups[k][1])))
            for key in list(groups):
                pop_and_emit(key)
            tiles_q.put(_SENTINEL)
        except BaseException as e:  # surface upload errors to the main thread
            tiles_q.put((_STAGE_ERROR, e))

    threading.Thread(target=uploader, daemon=True).start()

    while True:
        item = tiles_q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, tuple) and item[0] is _STAGE_ERROR:
            raise RuntimeError("ingest decode/upload stage failed") from item[1]
        tiles_d, metas = item
        buf_tiles.append(tiles_d)
        for dbidx, plan in metas:
            buf_meta.append(
                (np.full(plan.n_tiles, dbidx, dtype=np.int32),
                 plan.zoom_level, plan.boxes)
            )
        n_buf += sum(p.n_tiles for _, p in metas)
        flush()
    flush(final=True)
    materialize()

    if not all_vecs:
        raise RuntimeError(
            "extraction produced zero vectors: no image decoded successfully"
        )
    vectors = np.concatenate(all_vecs)
    norms = np.maximum(np.linalg.norm(vectors, axis=1, keepdims=True), 1e-6)
    vectors = vectors / norms
    dbidx = np.concatenate(all_dbidx)
    zoom = np.concatenate(all_zoom)
    boxes = np.concatenate(all_boxes)
    order = np.argsort(dbidx, kind="stable")
    return vectors[order], dbidx[order], zoom[order], boxes[order]


def create_multiscale_index(
    ds: SeesawDataset,
    index_name: str,
    model_name: str,
    *,
    tile_size: int = 224,
    factor: float = 0.5,
    min_tile_size: int = 224,
    batch_size: int = 256,
    force: bool = False,
    build_knn_graph: Optional[int] = None,
    limit: Optional[int] = None,
    mesh=None,
):
    """Build `<ds>/indices/<index_name>` from the dataset's images.

    model_name resolves through models.registry (e.g. 'clip-vit-b32',
    'clip-vit-b32:/path/ckpt', 'hash-64'). Optionally also builds the exact
    kNN graph with the given neighbor count."""
    from ..models.registry import load_embedding
    from ..runtime.cache import index_cache

    embedding = load_embedding(model_name)
    index_path = ds.index_path(index_name)
    index_cache.invalidate_prefix(str(index_path))  # rebuilds must not serve stale objects

    with transactional_folder(index_path, force=force) as tmp:
        vectors, dbidx, zoom, boxes = run_multiscale_extraction(
            ds, embedding,
            tile_size=tile_size, factor=factor, min_tile_size=min_tile_size,
            batch_size=batch_size, limit=limit, mesh=mesh,
        )
        np.savez(
            Path(tmp) / "vectors.npz",
            vectors=vectors, dbidx=dbidx, zoom_level=zoom, boxes=boxes,
        )
        info = {
            "constructor": "seesaw_tpu.indices.multiscale.MultiscaleIndex",
            "model": model_name,
            "dataset": str(ds.path),
            "excluded": [],
        }
        (Path(tmp) / "info.json").write_text(json.dumps(info, indent=2))

    # invalidate AFTER the commit too: a load in flight during the (long)
    # extraction finishes against the old folder and would re-memoize the
    # stale object past the pre-rebuild invalidation above
    index_cache.invalidate_prefix(str(index_path))
    idx = ds.load_index(index_name, options={})
    if build_knn_graph:
        from ..knn_graph import KNNGraph

        KNNGraph.build(idx.vectors, n_neighbors=build_knn_graph).save(
            idx.get_knng_path("")
        )
    return idx


def infer_coarse_vectors(
    vectors: np.ndarray, dbidx: np.ndarray, zoom: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Whole-image vectors: mean of each image's most-zoomed-out tiles,
    renormalized (reference `coarse/preprocessor.py:11-19`)."""
    out_dbidx = np.unique(dbidx)
    out = np.zeros((out_dbidx.shape[0], vectors.shape[1]), dtype=np.float32)
    for i, d in enumerate(out_dbidx):
        sel = dbidx == d
        zmax = zoom[sel].max()
        v = vectors[sel & (zoom == zmax)].mean(axis=0)
        out[i] = v / max(np.linalg.norm(v), 1e-6)
    return out, out_dbidx.astype(np.int32)


def create_coarse_index(ds: SeesawDataset, index_name: str, *, from_index: str,
                        force: bool = False):
    """Derive a coarse (one vector per image) index from a multiscale one."""
    fine = ds.load_index(from_index, options={})
    info_src = json.loads((Path(ds.index_path(from_index)) / "info.json").read_text())
    vecs, dbidx = infer_coarse_vectors(
        fine.vectors, fine.meta.dbidx, fine.meta.zoom_level
    )
    out_path = ds.index_path(index_name)
    from ..runtime.cache import index_cache

    index_cache.invalidate_prefix(str(out_path))
    with transactional_folder(out_path, force=force) as tmp:
        np.savez(Path(tmp) / "vectors.npz", vectors=vecs, dbidx=dbidx)
        info = {
            "constructor": "seesaw_tpu.indices.coarse.CoarseIndex",
            "model": info_src.get("model", ""),
            "dataset": str(ds.path),
        }
        (Path(tmp) / "info.json").write_text(json.dumps(info, indent=2))
    index_cache.invalidate_prefix(str(out_path))  # see create_multiscale_index
    return ds.load_index(index_name, options={})
