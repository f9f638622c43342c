"""Live episode viewer (cm3_tpu/utils/live_viewer.py): the HTTP
surface over the animated-SVG render stream that fills the reference's
live-window role (multiagent/rendering.py:1-345) on displayless TPU
hosts.  Serves real rendered SVGs from a temp root and checks the
page, the poll endpoint, static files, live updates, and traversal
safety."""

import json
import os
import urllib.request

from cm3_tpu.utils.live_viewer import serve_background

SVG = ("<svg xmlns='http://www.w3.org/2000/svg' width='8' height='8'>"
       "<rect width='8' height='8' fill='green'/></svg>")


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.read()


def test_live_viewer_serves_and_updates(tmp_path):
    root = tmp_path / "render"
    (root / "runA").mkdir(parents=True)
    (root / "runA" / "ep0.svg").write_text(SVG)
    srv, port = serve_background(str(root), refresh=1, latest=4)
    try:
        status, body = _get(port, "/")
        assert status == 200
        page = body.decode()
        assert "runA/ep0.svg" in page and "http-equiv='refresh'" in page

        status, body = _get(port, "/list")
        assert status == 200
        rows = json.loads(body)
        assert [r["path"] for r in rows] == [os.path.join("runA", "ep0.svg")]

        status, body = _get(port, "/runA/ep0.svg")
        assert status == 200 and b"<svg" in body

        # a NEW episode landing while serving appears on the next poll
        (root / "runA" / "ep1.svg").write_text(SVG)
        os.utime(root / "runA" / "ep1.svg", (2_000_000_000,) * 2)
        rows = json.loads(_get(port, "/list")[1])
        assert rows[0]["path"] == os.path.join("runA", "ep1.svg")
        assert "ep1.svg" in _get(port, "/")[1].decode()
    finally:
        srv.shutdown()


def test_live_viewer_rejects_traversal_and_non_svg(tmp_path):
    root = tmp_path / "render"
    root.mkdir()
    (root / "ep.svg").write_text(SVG)
    (tmp_path / "secret.svg").write_text("outside")
    (root / "notes.txt").write_text("not an svg")
    srv, port = serve_background(str(root))
    try:
        import urllib.error
        for bad in ("/../secret.svg", "/notes.txt", "/missing.svg"):
            try:
                status, _ = _get(port, bad)
            except urllib.error.HTTPError as e:
                status = e.code
            assert status == 404, bad
        assert _get(port, "/ep.svg")[0] == 200
    finally:
        srv.shutdown()
