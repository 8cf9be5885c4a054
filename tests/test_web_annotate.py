"""/annotate + re-annotation replay flow (reference seesaw_app.py:204-337):
open ground-truth annotations, edit, save via /session_end, round-trip via
/session_info; also reconstruct-from-saved-session with a new category."""
import json
import urllib.parse
import urllib.request
from pathlib import Path

import pytest

from synth import build_synthetic_root, CATEGORY, QSTR


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("annot_root")
    build_synthetic_root(str(root))
    save = tmp_path_factory.mktemp("annot_save")

    from seesaw_tpu.web.app import SeesawServer

    app = SeesawServer(str(root), str(save))
    httpd = app.serve(port=0)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", app
    httpd.shutdown()


class Client:
    def __init__(self, base):
        self.base = base
        self.cookie = None

    def post(self, path, body=None):
        req = urllib.request.Request(
            self.base + path,
            data=json.dumps(body).encode() if body is not None else b"",
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        if self.cookie:
            req.add_header("Cookie", f"session_id={self.cookie}")
        with urllib.request.urlopen(req) as resp:
            sc = resp.headers.get("Set-Cookie")
            if sc and "session_id=" in sc:
                self.cookie = sc.split("session_id=")[1].split(";")[0]
            return json.loads(resp.read())


def test_annotate_edit_save_roundtrip(server, tmp_path):
    base, _ = server
    c = Client(base)
    pathfile = tmp_path / "annot1"
    pathfile.mkdir()

    state = c.post(
        f"/annotate?dataset=synth&category={CATEGORY}&pathfile={pathfile}"
    )
    sess = state["session"]
    assert sess["params"]["annotation_category"] == CATEGORY
    gdata = sess["gdata"][0]
    assert len(gdata) > 0
    # prefilled with ground-truth boxes for the category
    n_boxes = sum(len(im["boxes"] or []) for im in gdata)
    assert n_boxes > 0
    assert state["save_path"] == str(pathfile)

    # edit: amend the first image's first box + add a new one
    gdata[0]["boxes"][0]["description"] = "edited description"
    gdata[0]["boxes"].append(
        dict(x1=1.0, y1=2.0, x2=30.0, y2=40.0,
             description="new box", marked_accepted=True)
    )
    c2 = Client(base)  # no session cookie: annotation save path
    out = c2.post("/session_end", {"client_data": state})
    assert out["token"] is None
    saved = json.loads((pathfile / "summary.json").read_text())
    assert saved["session"]["gdata"][0][0]["boxes"][0]["description"] == "edited description"

    # round-trip: /session_info re-opens the saved annotations
    state2 = c2.post("/session_info", {"path": str(pathfile)})
    boxes = state2["session"]["gdata"][0][0]["boxes"]
    assert boxes[0]["description"] == "edited description"
    assert boxes[-1]["description"] == "new box"
    assert boxes[-1]["x2"] == 30.0


def test_annotate_refuses_overwrite(server, tmp_path):
    base, _ = server
    c = Client(base)
    pathfile = tmp_path / "annot2"
    pathfile.mkdir()
    (pathfile / "summary.json").write_text("{}")
    with pytest.raises(urllib.error.HTTPError) as ei:
        c.post(f"/annotate?dataset=synth&category={CATEGORY}&pathfile={pathfile}")
    assert ei.value.code == 400


def test_session_info_reannotation(server):
    """Save a real session, then re-open it for re-annotation: gdata is
    refilled from the category's ground truth for the same dbidxs."""
    base, _ = server
    c = Client(base)
    state = c.post("/user_session?mode=plain&dataset=synth&index=multiscale")
    state = c.post(f"/text?key={urllib.parse.quote(QSTR)}")
    sess = state["session"]
    resp = c.post("/save", {"client_data": {"session": sess}})
    assert resp["path"]

    c2 = Client(base)
    state2 = c2.post(
        f"/session_info?annotation_category={CATEGORY}", {"path": resp["path"]}
    )
    sess2 = state2["session"]
    assert sess2["params"]["annotation_category"] == CATEGORY
    # same images as the saved session, boxes now from ground truth
    orig_idxs = [im["dbidx"] for r in sess["gdata"] for im in r]
    new_idxs = [im["dbidx"] for r in sess2["gdata"] for im in r]
    assert new_idxs == orig_idxs
    # fresh save path so the original log isn't clobbered
    assert "_annot_" in state2["save_path"]
    assert not Path(state2["save_path"]).exists()


def test_annotate_with_paths_yaml(server, tmp_path):
    """paths.yaml restricts the annotation set to the listed image paths."""
    base, app = server
    import yaml

    from seesaw_tpu.dataset import GlobalDataManager

    ds = GlobalDataManager(app[1].root_dir if isinstance(app, tuple) else app.root_dir).get_dataset("synth")
    chosen = [str(ds.paths[3]), str(ds.paths[7])]
    pathfile = tmp_path / "annot_paths"
    pathfile.mkdir()
    (pathfile / "paths.yaml").write_text(yaml.safe_dump(chosen))

    c = Client(base)
    state = c.post(
        f"/annotate?dataset=synth&category={CATEGORY}&pathfile={pathfile}"
    )
    gdata = state["session"]["gdata"][0]
    assert [im["dbidx"] for im in gdata] == [3, 7]
