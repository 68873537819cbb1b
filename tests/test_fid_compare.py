"""tools/fid_compare.py — the gen-vs-ema curve comparison command."""

import importlib.util
import json
import os

import pytest


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "fid_compare.py")
    spec = importlib.util.spec_from_file_location("fid_compare", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _doc(prefix, rows, **meta):
    base = {"n": 500, "styles": 3, "bootstrap": 100, "prefix": prefix,
            "protocol": "synchronized 2x style, eval blend, pool3 FID"}
    base.update(meta)
    base["rows"] = rows
    base["best"] = min(rows, key=lambda r: r["fid"])
    return base


def test_compare_table_and_verdict():
    tool = _load_tool()
    gen = _doc("gen", [
        {"iteration": 1000, "fid": 5.0, "fid_spread": 1.0},
        {"iteration": 2000, "fid": 2.0, "fid_spread": 0.5},
        {"iteration": 3000, "fid": 9.0, "fid_spread": 2.0},
    ])
    ema = _doc("ema", [
        {"iteration": 1000, "fid": 6.0, "fid_spread": 1.5},
        {"iteration": 2000, "fid": 1.5, "fid_spread": 0.4},
        {"iteration": 4000, "fid": 3.0, "fid_spread": 1.0},  # not common
    ])
    cmp = tool.compare(gen, ema, "gen", "ema")
    assert [r["iteration"] for r in cmp["rows"]] == [1000, 2000]
    assert cmp["rows"][0]["delta"] == 1.0      # ema worse at 1000
    assert cmp["rows"][1]["delta"] == -0.5     # ema better at 2000
    assert cmp["wins"] == {"gen": 1, "ema": 1}
    assert cmp["mean_fid"] == {"gen": 3.5, "ema": 3.75}
    assert cmp["best"]["gen"]["iteration"] == 2000
    assert cmp["best"]["ema"]["iteration"] == 2000  # best over ALL its rows


def test_compare_refuses_protocol_mismatch():
    tool = _load_tool()
    gen = _doc("gen", [{"iteration": 1000, "fid": 5.0}])
    ema = _doc("ema", [{"iteration": 1000, "fid": 6.0}], n=250)
    with pytest.raises(ValueError, match="protocol mismatch on 'n'"):
        tool.compare(gen, ema)


def test_cli_end_to_end(tmp_path, capsys):
    tool = _load_tool()
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    json.dump(_doc("gen", [{"iteration": 1000, "fid": 5.0}]), open(a, "w"))
    json.dump(_doc("ema", [{"iteration": 1000, "fid": 4.0}]), open(b, "w"))
    tool.main(["--a", str(a), "--b", str(b)])
    out = capsys.readouterr().out
    assert "| 1000 | 5.0 | 4.0 | -1.0 |" in out
    assert "wins: gen 0/1, ema 1/1" in out
