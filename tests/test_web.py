"""Web API tests: cookie flow, full labeled session over HTTP (the
reference's `tests/test_server.py` pattern, but hermetic)."""
import json
import urllib.error
import urllib.parse
import urllib.request

import numpy as np
import pytest

from synth import build_synthetic_root, QSTR


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("web_root")
    build_synthetic_root(str(root))
    save = tmp_path_factory.mktemp("web_save")

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


def test_ping(server):
    base, _ = server
    with urllib.request.urlopen(base + "/ping") as r:
        assert json.loads(r.read()) is True


def test_full_session_flow(server):
    base, _ = server
    c = Client(base)

    state = c.post("/user_session?mode=plain&dataset=synth&index=multiscale")
    assert c.cookie is not None
    assert state["session"] is not None

    state = c.post(f"/text?key={urllib.parse.quote(QSTR)}")
    sess = state["session"]
    assert sess["query_string"] == QSTR
    assert len(sess["gdata"]) == 1
    batch = sess["gdata"][0]
    assert len(batch) == 3  # default batch_size

    # label: accept the first image with a box, reject the rest
    batch[0]["boxes"] = [
        dict(x1=0, y1=0, x2=50, y2=50, description=None, marked_accepted=True)
    ]
    for im in batch[1:]:
        im["boxes"] = []
    state2 = c.post("/next", {"client_data": {"session": sess}})
    sess2 = state2["session"]
    assert len(sess2["gdata"]) == 2
    # label roundtrip preserved
    assert sess2["gdata"][0][0]["boxes"][0]["marked_accepted"] is True
    # no repeats
    seen = [im["dbidx"] for b in sess2["gdata"] for im in b]
    assert len(seen) == len(set(seen))

    # save writes a summary file
    resp = c.post("/save", {"client_data": {"session": sess2}})
    assert resp["path"]
    state3 = c.post("/session_info", {"path": resp["path"]})
    assert state3["session"]["query_string"] == QSTR

    # end session invalidates the cookie
    c.post("/session_end")
    with pytest.raises(urllib.error.HTTPError):
        c.post("/getstate")


def test_task_description(server):
    base, _ = server
    c = Client(base)
    out = c.post("/task_description?code=dg")
    assert out["description"]["qstr"] == "dogs"


def test_getstate_requires_cookie(server):
    base, _ = server
    c = Client(base)
    with pytest.raises(urllib.error.HTTPError) as ei:
        c.post("/getstate")
    assert ei.value.code == 404


def test_box_feedback_drives_multi_reg(server):
    """Per-box feedback (the box annotator's payload: partial-image boxes
    with descriptions) must flow through /next into MultiReg."""
    import copy

    base, _ = server
    c = Client(base)
    c.post("/user_session?mode=multi_reg&dataset=synth&index=multiscale")
    state = c.post(f"/text?key={urllib.parse.quote(QSTR)}")
    sess = state["session"]
    batch = sess["gdata"][0]

    # draw a box on the first image (partial coords + description), reject rest
    batch[0]["boxes"] = [
        dict(x1=10.0, y1=12.0, x2=90.0, y2=80.0,
             description="a drawn feedback box", marked_accepted=True)
    ]
    for im in batch[1:]:
        im["boxes"] = []

    before = copy.deepcopy(sess["gdata"])
    state2 = c.post("/next", {"client_data": {"session": sess}})
    sess2 = state2["session"]
    assert len(sess2["gdata"]) == 2
    # the box round-tripped exactly (coords + description preserved)
    b = sess2["gdata"][0][0]["boxes"][0]
    assert b["x1"] == 10.0 and b["y2"] == 80.0
    assert b["description"] == "a drawn feedback box"
    # refine consumed it: new results, no repeats
    seen = [im["dbidx"] for bt in sess2["gdata"] for im in bt]
    assert len(seen) == len(set(seen))
    assert len(sess2["gdata"][1]) > 0
    del before


def test_explore_endpoint(server):
    """/explore serves the standalone embedding-map HTML for an index."""
    base, _ = server
    with urllib.request.urlopen(base + "/explore?dataset=synth&clusters=4") as r:
        assert "text/html" in r.headers["Content-Type"]
        page = r.read().decode()
    assert "embedding map" in page
    assert "const D = " in page
    # query overlay path
    q = urllib.parse.quote(QSTR)
    with urllib.request.urlopen(base + f"/explore?dataset=synth&clusters=4&q={q}") as r:
        page2 = r.read().decode()
    assert QSTR in page2


def test_concurrent_sessions_isolated(server):
    """Parallel clients get isolated sessions (per-session locks, distinct
    cookies) and concurrent requests don't corrupt state."""
    from concurrent.futures import ThreadPoolExecutor

    base, _ = server

    def drive(i):
        c = Client(base)
        c.post("/user_session?mode=plain&dataset=synth&index=multiscale")
        state = c.post(f"/text?key={urllib.parse.quote(QSTR)}")
        sess = state["session"]
        for im in sess["gdata"][0]:
            im["boxes"] = []
        state2 = c.post("/next", {"client_data": {"session": sess}})
        seen = [im["dbidx"] for b in state2["session"]["gdata"] for im in b]
        return c.cookie, seen

    with ThreadPoolExecutor(4) as ex:
        results = list(ex.map(drive, range(4)))
    cookies = [r[0] for r in results]
    assert len(set(cookies)) == 4
    for _, seen in results:
        assert len(seen) == len(set(seen))  # no repeats within any session


def test_explore_query_not_sticky(server):
    base, _ = server
    q = urllib.parse.quote(QSTR)
    with urllib.request.urlopen(base + f"/explore?dataset=synth&q={q}") as r:
        assert QSTR in r.read().decode()
    with urllib.request.urlopen(base + "/explore?dataset=synth") as r:
        page = r.read().decode()
    assert QSTR not in page  # overlay must not persist across requests


def test_concurrent_next_over_shared_coalescing_index(tmp_path):
    """Integration: multiple HTTP sessions created from a yaml config with
    index_options={coalesce_ms} share ONE index object; simultaneous /next
    requests coalesce into batched device dispatches without deadlock, and
    each session keeps its no-repeat contract."""
    import json as js
    import sys
    import threading
    import urllib.parse
    import urllib.request
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from synth import build_synthetic_root, QSTR

    from seesaw_tpu.web.app import SeesawServer
    from seesaw_tpu.web.coalesce import CoalescingIndex

    root = tmp_path / "root"
    root.mkdir()
    build_synthetic_root(str(root), dataset_name="co")
    cfg = tmp_path / "conf.yaml"
    cfg.write_text(
        "shared_session_params:\n"
        "  batch_size: 3\n"
        "  shortlist_size: 20\n"
        "variants:\n"
        "  - name: co_plain\n"
        "    interactive: plain\n"
        "    agg_method: avg_score\n"
        "    aug_larger: all\n"
        "    index_options:\n"
        "      coalesce_ms: 25\n"
    )
    app = SeesawServer(str(root), str(tmp_path / "save"), config_path=str(cfg))
    httpd = app.serve(port=0)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def req(method, path, cookie=None, body=None):
        data = js.dumps(body).encode() if body is not None else b""
        r = urllib.request.Request(base + path, data=data, method=method,
                                   headers={"Content-Type": "application/json"})
        if cookie:
            r.add_header("Cookie", cookie)
        resp = urllib.request.urlopen(r)
        sc = resp.headers.get("Set-Cookie")
        return js.loads(resp.read()), (sc.split(";")[0] if sc else cookie)

    cookies, states = [], []
    for _ in range(3):
        _, c = req("POST", "/user_session?mode=yaml_co_plain&dataset=co&index=multiscale")
        st, _ = req("POST", f"/text?key={urllib.parse.quote(QSTR)}", cookie=c)
        cookies.append(c)
        states.append(st)

    sessions = [app.manager.get_session(c.split("=")[1]).session for c in cookies]
    assert sessions[0].index is sessions[1].index is sessions[2].index
    assert isinstance(sessions[0].index, CoalescingIndex)

    errors, seen = [], [set() for _ in cookies]

    def drive(i):
        try:
            st = states[i]
            for _ in range(3):
                for im in st["session"]["gdata"][-1]:
                    assert im["dbidx"] not in seen[i]
                    seen[i].add(im["dbidx"])
                    im["boxes"] = []
                st, _ = req("POST", "/next", cookie=cookies[i],
                            body={"client_data": st})
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=drive, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    httpd.shutdown()
    assert not errors
    assert all(len(s) == 9 for s in seen)
    assert sessions[0].index._coalescer.stats["dispatches"] >= 0  # no deadlock


def test_static_serving_contained_to_root(server):
    """Image files under the data root serve; anything outside (or reached
    via traversal) is refused — the url path IS the absolute file path."""
    base, app = server
    # a real file under the data root serves (synth registers image paths
    # without writing files, so write one)
    from pathlib import Path

    from seesaw_tpu.dataset import GlobalDataManager

    gdm = GlobalDataManager(app.root_dir)
    ds = gdm.get_dataset("synth")
    fpath = Path(ds.file_path(int(ds.dbidxs[0])))
    fpath.parent.mkdir(parents=True, exist_ok=True)
    fpath.write_bytes(b"fakejpegbytes")
    url = ds.get_urls([ds.dbidxs[0]])[0]
    with urllib.request.urlopen(base + urllib.parse.quote(url)) as resp:
        assert resp.status == 200 and resp.read() == b"fakejpegbytes"

    # absolute path outside the root is refused
    for bad in ("/etc/passwd",
                urllib.parse.quote(str(app.serve_files_root)) + "/../../etc/passwd"):
        try:
            with urllib.request.urlopen(base + bad) as resp:
                body = json.loads(resp.read())
                assert "detail" in body, f"served {bad}!"  # fell through to 404 API
        except urllib.error.HTTPError as e:
            assert e.code in (404, 400)


def test_session_end_saves_final_labels(server, tmp_path):
    """The final round's labels posted with /session_end land in the saved
    summary (the old handler dropped the body: silent data loss)."""
    base, app = server
    c = Client(base)
    c.post("/user_session?mode=plain&dataset=synth&index=multiscale")
    state = c.post(f"/text?key={urllib.parse.quote(QSTR)}")
    # label the last batch client-side, then end the session with the body
    for im in state["session"]["gdata"][-1]:
        im["boxes"] = [dict(x1=0.0, y1=0.0, x2=50.0, y2=50.0,
                            marked_accepted=True)]
    sid = c.cookie
    out = c.post("/session_end", body={"client_data": state})
    assert out["token"] == sid
    # the save wrote the labels
    import glob

    paths = glob.glob(f"{app.manager.save_path}/session_{sid}/**/summary.json",
                      recursive=True)
    assert paths, "no summary written"
    saved = json.loads(open(paths[-1]).read())
    gdata = saved["session"]["gdata"]
    assert any(
        im["boxes"] for batch in gdata for im in batch if im["boxes"]
    ), "final labels were dropped from the saved session"
