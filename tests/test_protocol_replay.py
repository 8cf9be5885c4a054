"""Record-and-replay of the reference Vue frontend's wire protocol.

Each test replays the exact request sequence SeesawApp.vue issues (method,
path, query-vs-body placement, body shape — transcribed from
/root/reference/frontend/src/SeesawApp.vue: mounted() 354-392, text() 870-
892, next() 893-920, reset() 851-869, finish_session() 530-541, next_task()
542-560, get_end_description() 515-522) against our server, asserting the
response fields the frontend actually reads."""
import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from synth import build_synthetic_root, CATEGORY, QSTR


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("proto_root")
    # name the dataset 'bdd' so the user-study task list (g_queries) resolves
    build_synthetic_root(str(root), dataset_name="bdd")
    save = tmp_path_factory.mktemp("proto_save")

    from seesaw_tpu.web.app import SeesawServer

    app = SeesawServer(str(root), str(save))
    httpd = app.serve(port=0)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", app
    httpd.shutdown()


class VueClient:
    """Issues requests byte-shaped like the Vue app's fetch() calls."""

    def __init__(self, base):
        self.base = base
        self.cookie = None

    def request(self, method, path, body=None, raw_empty=False):
        data = None
        if method == "POST":
            data = b"" if (body is None and raw_empty) else (
                json.dumps(body).encode() if body is not None else b"null"
            )
        req = urllib.request.Request(
            self.base + path, data=data, method=method,
            headers={"Content-Type": "application/json"},
        )
        if self.cookie:
            req.add_header("Cookie", f"session_id={self.cookie}")
        with urllib.request.urlopen(req) as resp:
            sc = resp.headers.get("Set-Cookie")
            if sc and "session_id=" in sc:
                self.cookie = sc.split("session_id=")[1].split(";")[0]
            return json.loads(resp.read())


def _assert_appstate(d):
    for key in ("indices", "worker_state", "default_params", "session"):
        assert key in d, f"AppState missing {key}"


def test_user_session_flow(server):
    """mounted(/user_session) -> text() -> next() -> reset() -> reset(cfg)."""
    base, _ = server
    c = VueClient(base)

    # mounted(): POST /user_session?<url params>, empty body
    state = c.request(
        "POST", "/user_session?mode=plain&dataset=bdd&index=multiscale",
        raw_empty=True,
    )
    _assert_appstate(state)
    assert c.cookie

    # text(): POST /text?key=..., body {}
    state = c.request(
        "POST", f"/text?key={urllib.parse.quote(QSTR)}", body={}
    )
    _assert_appstate(state)
    sess = state["session"]
    assert sess["query_string"] == QSTR and len(sess["gdata"][0]) > 0

    # next(): POST /next with the FULL client_data AppState (not just session)
    for im in state["session"]["gdata"][0]:
        im["boxes"] = []
    state2 = c.request("POST", "/next", body={"client_data": state})
    _assert_appstate(state2)
    assert len(state2["session"]["gdata"]) == 2

    # reset(null): POST /reset {config: null} -> state unchanged, no error
    state3 = c.request("POST", "/reset", body={"config": None})
    _assert_appstate(state3)

    # reset(config): POST /reset {config: <SessionParams>} -> fresh session
    cfg = dict(state2["session"]["params"])
    state4 = c.request("POST", "/reset", body={"config": cfg})
    _assert_appstate(state4)
    assert state4["session"]["gdata"] == []


def test_worker_task_flow(server):
    """mounted(/session) -> next_task() -> GET task_description -> end."""
    base, _ = server
    c = VueClient(base)

    state = c.request("POST", "/session?mode=plain", raw_empty=True)
    _assert_appstate(state)
    ws = state["worker_state"]
    assert ws is not None and ws["current_task_index"] == -1
    assert len(ws["task_list"]) > 0
    assert ws["task_list"][0]["qkey"] == "pc"

    # next_task(): POST with full client_data
    state2 = c.request("POST", "/next_task", body={"client_data": state})
    _assert_appstate(state2)
    assert state2["worker_state"]["current_task_index"] == 0
    assert state2["session"] is not None

    # get_end_description(): GET /task_description?code=<next qkey>
    code = ws["task_list"][1]["qkey"]
    notif = c.request("GET", f"/task_description?code={code}")
    assert notif["description"]["qstr"] == "dogs"
    assert "urls" in notif and "neg_urls" in notif

    # finish_session(): POST /session_end with {client_data}
    out = c.request("POST", "/session_end", body={"client_data": state2})
    assert "token" in out


def test_session_end_null_body(server):
    """finish_session() with no session posts literal null."""
    base, _ = server
    c = VueClient(base)
    out = c.request("POST", "/session_end", body=None)
    assert out == {"token": None}


def test_session_info_via_query_params(server):
    """mounted(/session_info) passes ?path=... as QUERY params, empty body."""
    base, _ = server
    c = VueClient(base)
    c.request("POST", "/user_session?mode=plain&dataset=bdd&index=multiscale",
              raw_empty=True)
    state = c.request("POST", f"/text?key={urllib.parse.quote(QSTR)}", body={})
    resp = c.request("POST", "/save", body={"client_data": state})
    path = resp["path"]

    c2 = VueClient(base)
    state2 = c2.request(
        "POST", "/session_info?" + urllib.parse.urlencode({"path": path}),
        raw_empty=True,
    )
    _assert_appstate(state2)
    assert state2["session"]["query_string"] == QSTR


def test_annotate_via_query_params(server, tmp_path):
    """mounted(/annotate) passes dataset/category/pathfile as query params."""
    base, _ = server
    c = VueClient(base)
    pathfile = tmp_path / "annot"
    pathfile.mkdir()
    state = c.request(
        "POST",
        "/annotate?" + urllib.parse.urlencode(
            dict(dataset="bdd", category=CATEGORY, pathfile=str(pathfile))
        ),
        raw_empty=True,
    )
    _assert_appstate(state)
    assert state["save_path"] == str(pathfile)
    assert state["session"]["params"]["annotation_category"] == CATEGORY


def test_load_session_body_variant(server):
    """load_session() (SeesawApp.vue:498-506, also the /compare flow) posts
    /session_info with a JSON BODY {path: ...} — distinct from the
    mounted(/session_info) query-param placement tested above."""
    base, _ = server
    c = VueClient(base)
    c.request("POST", "/user_session?mode=plain&dataset=bdd&index=multiscale",
              raw_empty=True)
    state = c.request("POST", f"/text?key={urllib.parse.quote(QSTR)}", body={})
    resp = c.request("POST", "/save", body={"client_data": state})

    c2 = VueClient(base)
    state2 = c2.request("POST", "/session_info", body={"path": resp["path"]})
    _assert_appstate(state2)
    assert state2["session"]["query_string"] == QSTR


def test_annotator_labeled_feedback_round(server):
    """The m-annotator box-drawing flow: paper2imdata (m-annotator.vue:
    176-198) emits boxes {x1,y1,x2,y2,description,marked_accepted} into the
    gdata imdata; next() posts the whole client_data back. The server must
    ingest the labels (accepted count grows) and never repeat images."""
    base, _ = server
    c = VueClient(base)
    c.request("POST", "/user_session?mode=plain&dataset=bdd&index=multiscale",
              raw_empty=True)
    state = c.request("POST", f"/text?key={urllib.parse.quote(QSTR)}", body={})

    seen, accepted_dbidx = set(), []
    for round_ in range(3):
        gdata = state["session"]["gdata"]
        for j, im in enumerate(gdata[-1]):
            assert im["dbidx"] not in seen, "server repeated an image"
            seen.add(im["dbidx"])
            if j == 0:  # user draws an accepted box on the first image
                im["boxes"] = [dict(
                    x1=10.0, y1=10.0, x2=120.5, y2=99.25,
                    description="a dog", marked_accepted=True,
                )]
                accepted_dbidx.append(im["dbidx"])
            else:  # viewed, no boxes drawn -> negative
                im["boxes"] = []
        state = c.request("POST", "/next", body={"client_data": state})
        _assert_appstate(state)

    # the drawn boxes round-trip through get_state verbatim
    drawn = [
        b
        for batch in state["session"]["gdata"][:-1]
        for im in batch
        for b in (im["boxes"] or [])
    ]
    assert len(drawn) == 3
    assert all(b["marked_accepted"] and b["x2"] == 120.5 for b in drawn)
    # server counted the accepts (action_log carries running totals)
    assert state["session"]["action_log"][-1]["accepted"] == len(accepted_dbidx)


def test_annotator_edit_sequences_and_timing(server):
    """The full m-annotator edit lifecycle over the wire (m-annotator.vue
    box move/resize/delete + description + accepted toggle, and the
    mounted->annotator_end view intervals, m-annotator.vue:56-76): edits to
    PREVIOUSLY-shipped rounds must round-trip through update_state, flip
    the accept counters, and Imdata.timing must persist across rounds."""
    base, _ = server
    c = VueClient(base)
    c.request("POST", "/user_session?mode=plain&dataset=bdd&index=multiscale",
              raw_empty=True)
    state = c.request("POST", f"/text?key={urllib.parse.quote(QSTR)}", body={})

    # round 1: draw two boxes on the first image + record a view interval
    gdata = state["session"]["gdata"]
    first = gdata[-1][0]
    first["boxes"] = [
        dict(x1=10.0, y1=10.0, x2=60.0, y2=60.0,
             description="a dog", marked_accepted=True),
        dict(x1=100.0, y1=100.0, x2=150.0, y2=140.0,
             description=None, marked_accepted=True),
    ]
    first["timing"] = [dict(start_ms=1000, end_ms=2500)]
    for im in gdata[-1][1:]:
        im["boxes"] = []
    state = c.request("POST", "/next", body={"client_data": state})
    acc_after_r1 = state["session"]["action_log"][-1]["accepted"]
    assert acc_after_r1 == 1

    # the shipped timing came back with the state
    prev = state["session"]["gdata"][0][0]
    assert prev["timing"] == [dict(start_ms=1000, end_ms=2500)]
    assert len(prev["boxes"]) == 2

    # round 2: EDIT the old image's boxes — move+resize box 0, delete box 1,
    # change the description, toggle accepted -> rejected; append a second
    # view interval. Label the new batch negative.
    prev["boxes"] = [dict(x1=30.0, y1=35.0, x2=95.5, y2=120.25,
                          description="edited dog",
                          marked_accepted=False)]
    prev["timing"] = prev["timing"] + [dict(start_ms=9000, end_ms=9900)]
    for im in state["session"]["gdata"][-1]:
        im["boxes"] = []
    state = c.request("POST", "/next", body={"client_data": state})
    _assert_appstate(state)

    back = state["session"]["gdata"][0][0]
    assert back["boxes"] == [dict(
        x1=30.0, y1=35.0, x2=95.5, y2=120.25,
        description="edited dog", marked_accepted=False,
    )]
    assert back["timing"] == [dict(start_ms=1000, end_ms=2500),
                              dict(start_ms=9000, end_ms=9900)]
    # the accept was REVERSED by the edit: running accepted count drops to 0
    assert state["session"]["action_log"][-1]["accepted"] == 0

    # the session's saved JSON preserves timing for user_data_analysis
    resp = c.request("POST", "/save", body={"client_data": state})
    with open(f"{resp['path']}/summary.json") as f:
        saved = json.load(f)
    saved_first = saved["session"]["gdata"][0][0]
    assert saved_first["timing"][0]["start_ms"] == 1000
