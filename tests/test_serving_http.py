"""HTTP serving front: request/response contract over a live ephemeral port."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from aclgan_tpu.serving import Translator
from aclgan_tpu.serving_http import make_server
from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import save_checkpoint
from tests.helpers import tiny_config


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("http")
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    save_checkpoint(str(root), state, iterations=0)
    tr = Translator(cfg, str(root / "gen_00000001.msgpack"),
                    batch_size=2, size=16, seed=1)
    httpd = make_server(tr, port=0, max_wait_ms=1.0)  # ephemeral port
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, cfg
    httpd.shutdown()
    httpd.aclgan_async.close(drain=False)


def _jpeg_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def test_healthz(server):
    base, cfg = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["style_dim"] == cfg.gen.style_dim
    assert body["size"] == 16


def test_translate_roundtrip(server):
    base, cfg = server
    img = np.random.RandomState(0).randint(0, 255, (20, 24, 3), np.uint8)
    req = urllib.request.Request(base + "/translate", data=_jpeg_bytes(img),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "image/jpeg"
        out = Image.open(io.BytesIO(r.read()))
    assert out.size == (16, 16)

    # style control: a fixed X-Style header is deterministic
    def with_style(vals):
        rq = urllib.request.Request(base + "/translate", data=_jpeg_bytes(img),
                                    headers={"X-Style": vals}, method="POST")
        with urllib.request.urlopen(rq, timeout=120) as r:
            return np.asarray(Image.open(io.BytesIO(r.read())))

    z = ",".join(["0.5"] * cfg.gen.style_dim)
    np.testing.assert_array_equal(with_style(z), with_style(z))


def test_bad_requests(server):
    base, cfg = server
    # garbage body -> 400 with a JSON error
    req = urllib.request.Request(base + "/translate", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400
    assert "error" in json.loads(exc.value.read())

    # wrong style length -> 400 (fails only that request; server stays up)
    img = np.zeros((16, 16, 3), np.uint8)
    req = urllib.request.Request(base + "/translate", data=_jpeg_bytes(img),
                                 headers={"X-Style": "1.0,2.0"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert exc.value.code == 404

    # and a good request still succeeds afterwards
    req = urllib.request.Request(base + "/translate", data=_jpeg_bytes(img),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
