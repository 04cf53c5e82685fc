"""Aux subsystems (SURVEY.md §5): resume manifest, fault-inject recovery,
IO codecs, metrics, profiling harness."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from fsgm_tpu.utils.manifest import RunManifest
from fsgm_tpu.eval.metrics import d1_all, fl_all
from fsgm_tpu.io import kitti
from fsgm_tpu.io.images import write_pgm, read_pgm, write_pfm, read_pfm


def test_manifest_resume(tmp_path):
    m = RunManifest(tmp_path / "m.jsonl")
    assert m.pending(["a", "b"]) == ["a", "b"]
    out = tmp_path / "a.png"
    out.write_bytes(b"x")
    m.mark_done("a", str(out), wall_s=0.1)
    assert m.is_done("a") and not m.is_done("b")
    # reload from disk
    m2 = RunManifest(tmp_path / "m.jsonl")
    assert m2.pending(["a", "b"]) == ["b"]
    # missing output file -> not done
    out.unlink()
    m3 = RunManifest(tmp_path / "m.jsonl")
    assert m3.pending(["a"]) == ["a"]


def test_manifest_torn_write(tmp_path):
    path = tmp_path / "m.jsonl"
    path.write_text('{"frame_id": "a", "status": "done", "output": null}\n'
                    '{"frame_id": "b", "sta')  # torn crash write
    m = RunManifest(path)
    assert m.is_done("a") and not m.is_done("b")


@pytest.mark.slow
def test_batch_fault_inject_and_resume(tmp_path):
    """End-to-end recovery: worker dies mid-batch, rerun completes rest."""
    from fsgm_tpu.io.synthetic import random_dot_stereo
    from fsgm_tpu.io.images import save_gray
    repo = Path(__file__).resolve().parents[2]
    lines = []
    for i in range(3):
        il, ir, _ = random_dot_stereo(24, 32, 8, seed=i)
        l, r = tmp_path / f"l{i}.png", tmp_path / f"r{i}.png"
        save_gray(l, il), save_gray(r, ir)
        lines.append(f"{l} {r} {tmp_path}/d{i}.png")
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(lines))
    env = dict(os.environ,
               PYTHONPATH=str(repo),
               JAX_PLATFORMS="cpu")
    cmd = [sys.executable, "-m", "fsgm_tpu.cli", "batch", str(lst),
           "--manifest", str(tmp_path / "m.jsonl"), "--max-disp", "8",
           "--backend", "xla"]
    # conftest-style cpu forcing for subprocess
    pre = ("import jax; jax.config.update('jax_platforms','cpu');"
           "from fsgm_tpu.cli.main import main; import sys;"
           "sys.exit(main(sys.argv[1:]))")
    cmd = [sys.executable, "-c", pre, "batch", str(lst),
           "--manifest", str(tmp_path / "m.jsonl"), "--max-disp", "8",
           "--backend", "xla"]
    r1 = subprocess.run(cmd + ["--fault-inject", "1"], env=env,
                        cwd=repo, capture_output=True, text=True)
    assert r1.returncode == 17, r1.stderr[-2000:]
    done_after_fault = sum(1 for i in range(3)
                           if (tmp_path / f"d{i}.png").exists())
    assert done_after_fault == 1
    r2 = subprocess.run(cmd, env=env, cwd=repo, capture_output=True,
                        text=True)
    assert r2.returncode == 0, r2.stderr[-2000:]
    rec = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rec["newly_done"] == 2 and rec["skipped"] == 1
    assert all((tmp_path / f"d{i}.png").exists() for i in range(3))


def test_cli_video_sequence(tmp_path):
    """End-to-end `cli video`: 3 frames -> 2 temporally-seeded flow pairs
    written as KITTI PNGs, per-pair + summary JSON records emitted."""
    from fsgm_tpu.io.synthetic import constant_flow_sequence
    from fsgm_tpu.io.images import save_gray
    from fsgm_tpu.io import kitti
    repo = Path(__file__).resolve().parents[2]
    frames, _ = constant_flow_sequence(32, 48, 2, -1, 3, seed=4)
    paths = []
    for i, fr in enumerate(frames):
        fp = tmp_path / f"f{i}.png"
        save_gray(fp, fr)
        paths.append(str(fp))
    lst = tmp_path / "frames.txt"
    lst.write_text("\n".join(paths))
    env = dict(os.environ, PYTHONPATH=str(repo), JAX_PLATFORMS="cpu")
    pre = ("import jax; jax.config.update('jax_platforms','cpu');"
           "from fsgm_tpu.cli.main import main; import sys;"
           "sys.exit(main(sys.argv[1:]))")
    cmd = [sys.executable, "-c", pre, "video", str(lst),
           "-o", str(tmp_path / "out"), "--search-radius", "2",
           "--levels", "2", "--track-levels", "2", "--backend", "xla"]
    r = subprocess.run(cmd, env=env, cwd=repo, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(ln) for ln in r.stdout.strip().splitlines()]
    assert recs[-1]["pairs"] == 2
    for i in range(2):
        flo, valid = kitti.read_flow_png(tmp_path / "out" / f"f{i}.png")
        assert flo.shape == (32, 48, 2) and valid.any()


def test_cli_serve_loop(tmp_path):
    """Persistent serving: stereo + flow requests through one process,
    responses in order, per-request fault isolation (bad path -> error
    record, loop keeps serving)."""
    from fsgm_tpu.io.synthetic import random_dot_stereo, constant_flow_pair
    from fsgm_tpu.io.images import save_gray
    repo = Path(__file__).resolve().parents[2]
    il, ir, _ = random_dot_stereo(24, 32, 8, seed=0)
    i1, i2, _ = constant_flow_pair(24, 32, 1, -1, seed=1)
    for name, img in (("l", il), ("r", ir), ("a", i1), ("b", i2)):
        save_gray(tmp_path / f"{name}.png", img)
    reqs = [
        {"task": "stereo", "id": "s0", "left": str(tmp_path / "l.png"),
         "right": str(tmp_path / "r.png"), "out": str(tmp_path / "d.png")},
        {"task": "stereo", "id": "bad", "left": str(tmp_path / "nope.png"),
         "right": str(tmp_path / "r.png"), "out": str(tmp_path / "x.png")},
        "this is not json",   # malformed line: error record, loop survives
        {"task": "flow", "id": "f0", "first": str(tmp_path / "a.png"),
         "second": str(tmp_path / "b.png"),
         "out": str(tmp_path / "f.png")},
        {"task": "stereo_batch", "id": "sb",
         "pairs": [[str(tmp_path / "l.png"), str(tmp_path / "r.png"),
                    str(tmp_path / "db0.png")],
                   [str(tmp_path / "l.png"), str(tmp_path / "r.png"),
                    str(tmp_path / "db1.png")]]},
    ]
    env = dict(os.environ, PYTHONPATH=str(repo), JAX_PLATFORMS="cpu")
    pre = ("import jax; jax.config.update('jax_platforms','cpu');"
           "from fsgm_tpu.cli.main import main; import sys;"
           "sys.exit(main(sys.argv[1:]))")
    cmd = [sys.executable, "-c", pre, "serve", "--max-disp", "8",
           "--search-radius", "2", "--levels", "2", "--backend", "xla"]
    inp = "\n".join(r if isinstance(r, str) else json.dumps(r)
                    for r in reqs) + "\n"
    r = subprocess.run(cmd, env=env, cwd=repo, input=inp,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(ln) for ln in r.stdout.strip().splitlines()]
    assert recs[0]["serving"] and recs[-1]["served"] == 5
    body = recs[1:-1]
    # the malformed line must get its OWN error record (id = its stream
    # index, never the previous request's id)
    assert [x["id"] for x in body] == ["s0", "bad", 2, "f0", "sb"]
    assert "error" in body[1] and "error" in body[2]
    assert "out" in body[0] and "out" in body[3]
    assert (tmp_path / "d.png").exists() and (tmp_path / "f.png").exists()
    # the batched request writes every pair, bit-identical to the single
    # stereo request over the same inputs
    assert body[4]["outs"] == [str(tmp_path / "db0.png"),
                               str(tmp_path / "db1.png")]
    from fsgm_tpu.io import kitti as _k
    single = _k.read_disparity_png(tmp_path / "d.png")
    for nm in ("db0.png", "db1.png"):
        np.testing.assert_array_equal(
            _k.read_disparity_png(tmp_path / nm), single)


def test_cli_serve_pipeline(tmp_path):
    """`serve --pipeline K` dispatches single-pair requests ahead of the
    fetch (JAX async dispatch) but must preserve response order, fault
    isolation, and bit-identical outputs vs the synchronous loop — the
    batch task and errors force a drain first."""
    from fsgm_tpu.io.synthetic import random_dot_stereo, constant_flow_pair
    from fsgm_tpu.io.images import save_gray
    repo = Path(__file__).resolve().parents[2]
    il, ir, _ = random_dot_stereo(24, 32, 8, seed=0)
    i1, i2, _ = constant_flow_pair(24, 32, 1, -1, seed=1)
    for name, img in (("l", il), ("r", ir), ("a", i1), ("b", i2)):
        save_gray(tmp_path / f"{name}.png", img)
    reqs = [
        {"task": "stereo", "id": "s0", "left": str(tmp_path / "l.png"),
         "right": str(tmp_path / "r.png"), "out": str(tmp_path / "d0.png")},
        {"task": "stereo", "id": "s1", "left": str(tmp_path / "l.png"),
         "right": str(tmp_path / "r.png"), "out": str(tmp_path / "d1.png")},
        {"task": "flow", "id": "f0", "first": str(tmp_path / "a.png"),
         "second": str(tmp_path / "b.png"),
         "out": str(tmp_path / "f.png")},
        # bad path arrives while two requests are still in flight: the
        # error record must come AFTER their responses, not before
        {"task": "stereo", "id": "bad", "left": str(tmp_path / "no.png"),
         "right": str(tmp_path / "r.png"), "out": str(tmp_path / "x.png")},
        {"task": "stereo_batch", "id": "sb",
         "pairs": [[str(tmp_path / "l.png"), str(tmp_path / "r.png"),
                    str(tmp_path / "db.png")]]},
        {"task": "stereo", "id": "s2", "left": str(tmp_path / "l.png"),
         "right": str(tmp_path / "r.png"), "out": str(tmp_path / "d2.png")},
    ]
    env = dict(os.environ, PYTHONPATH=str(repo), JAX_PLATFORMS="cpu")
    pre = ("import jax; jax.config.update('jax_platforms','cpu');"
           "from fsgm_tpu.cli.main import main; import sys;"
           "sys.exit(main(sys.argv[1:]))")
    cmd = [sys.executable, "-c", pre, "serve", "--max-disp", "8",
           "--search-radius", "2", "--levels", "2", "--backend", "xla",
           "--pipeline", "2"]
    inp = "\n".join(json.dumps(r) for r in reqs) + "\n"
    r = subprocess.run(cmd, env=env, cwd=repo, input=inp,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(ln) for ln in r.stdout.strip().splitlines()]
    assert recs[0]["serving"] and recs[-1]["served"] == 6
    body = recs[1:-1]
    assert [x["id"] for x in body] == ["s0", "s1", "f0", "bad", "sb",
                                       "s2"]
    assert "error" in body[3] and "out" in body[0] and "out" in body[2]
    # pipelined outputs == the single-dispatch outputs (d0 == d1 == d2
    # == the batch's db over identical inputs)
    from fsgm_tpu.io import kitti as _k
    d0 = _k.read_disparity_png(tmp_path / "d0.png")
    for nm in ("d1.png", "d2.png", "db.png"):
        np.testing.assert_array_equal(
            _k.read_disparity_png(tmp_path / nm), d0)
    flo, valid = _k.read_flow_png(tmp_path / "f.png")
    assert flo.shape == (24, 32, 2) and valid.any()


def test_densify_flow():
    """Devkit-style densification: invalid pixels take the nearest valid
    LEFT neighbor (else right); valid pixels and all-invalid rows are
    untouched."""
    from fsgm_tpu.cli.main import densify_flow
    flow = np.zeros((3, 5, 2))
    flow[..., 0] = np.arange(5)[None, :]          # u = column index
    flow[..., 1] = -np.arange(5)[None, :]
    valid = np.array([[1, 0, 0, 1, 0],
                      [0, 0, 1, 0, 0],
                      [0, 0, 0, 0, 0]], dtype=bool)
    out = densify_flow(flow, valid)
    # row 0: cols 1,2 <- col 0; col 4 <- col 3
    np.testing.assert_array_equal(out[0, :, 0], [0, 0, 0, 3, 3])
    # row 1: cols 0,1 <- col 2 (no left), cols 3,4 <- col 2
    np.testing.assert_array_equal(out[1, :, 0], [2, 2, 2, 2, 2])
    # row 2: no valid pixel -> original values kept
    np.testing.assert_array_equal(out[2], flow[2])
    # valid pixels always untouched (both channels)
    np.testing.assert_array_equal(out[valid], flow[valid])


def test_metrics_d1():
    gt = np.full((10, 10), 20.0)
    pred = gt.copy()
    pred[0, :5] = 10.0   # 5 bad pixels
    pred[1, 0] = -1.0    # invalid
    m = d1_all(pred, gt, gt > 0)
    assert abs(m["d1_all"] - 6 / 100) < 1e-9
    assert m["density"] == 0.99


def test_metrics_fl():
    gt = np.zeros((8, 8, 2))
    gt[..., 0] = 10.0
    pred = gt.copy()
    pred[0, 0] = (20.0, 0.0)   # epe 10 > 3 and > 5%*10
    m = fl_all(pred, gt)
    assert abs(m["fl_all"] - 1 / 64) < 1e-9


def test_pgm_pfm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (17, 23)).astype(np.uint8)
    write_pgm(tmp_path / "x.pgm", img)
    np.testing.assert_array_equal(read_pgm(tmp_path / "x.pgm"), img)
    f = rng.normal(size=(9, 11)).astype(np.float32)
    write_pfm(tmp_path / "x.pfm", f)
    np.testing.assert_array_equal(read_pfm(tmp_path / "x.pfm"), f)


def test_kitti_codecs_roundtrip(tmp_path, rng):
    d = rng.random((12, 15)) * 100
    kitti.write_disparity_png(tmp_path / "d.png", d)
    back = kitti.read_disparity_png(tmp_path / "d.png")
    np.testing.assert_allclose(back, d, atol=1 / 256 + 1e-6)
    flow = (rng.random((12, 15, 2)) * 40 - 20).astype(np.float32)
    valid = rng.random((12, 15)) > 0.3
    kitti.write_flow_png(tmp_path / "f.png", flow, valid)
    fb, vb = kitti.read_flow_png(tmp_path / "f.png")
    np.testing.assert_array_equal(vb, valid)
    np.testing.assert_allclose(fb[valid], flow[valid], atol=1 / 64 + 1e-6)
    kitti.write_flo(tmp_path / "f.flo", flow)
    np.testing.assert_array_equal(kitti.read_flo(tmp_path / "f.flo"), flow)


def test_stage_timer():
    from fsgm_tpu.utils.profiling import StageTimer, sgm_bytes_model
    t = StageTimer(peak_gbs=100.0)
    with t.stage("x", bytes_moved=1000):
        pass
    rep = t.report()
    assert rep[0]["stage"] == "x" and rep[0]["bytes"] == 1000
    model = sgm_bytes_model(375, 1242, 128, 8)
    assert model["total"] > model["aggregate"] > 0


def test_presets_load():
    from pathlib import Path
    from fsgm_tpu.params import load_preset, SGMParams, FlowParams
    cfgs = sorted((Path(__file__).resolve().parents[2] / "configs").glob("*.json"))
    assert len(cfgs) == 5
    kinds = set()
    for c in cfgs:
        d = load_preset(c)
        for v in d.values():
            if isinstance(v, (SGMParams, FlowParams)):
                kinds.add(type(v).__name__)
    assert kinds == {"SGMParams", "FlowParams"}


def test_batch_dispatch_batching_matches(tmp_path):
    """--dispatch-batch groups same-shape pairs into one batched dispatch;
    outputs must be identical to the single-dispatch run, including across
    a shape change mid-list (the carry path)."""
    from fsgm_tpu.io.synthetic import random_dot_stereo
    from fsgm_tpu.io.images import save_gray
    from fsgm_tpu.io import kitti
    repo = Path(__file__).resolve().parents[2]
    shapes = [(24, 32), (24, 32), (16, 40), (24, 32), (24, 32)]
    lines = []
    for i, (h, w) in enumerate(shapes):
        il, ir, _ = random_dot_stereo(h, w, 8, seed=i)
        l, r = tmp_path / f"l{i}.png", tmp_path / f"r{i}.png"
        save_gray(l, il), save_gray(r, ir)
        lines.append(f"{l} {r} {tmp_path}/OUT/d{i}.png")
    lst = tmp_path / "list.txt"
    env = dict(os.environ, PYTHONPATH=str(repo), JAX_PLATFORMS="cpu")
    pre = ("import jax; jax.config.update('jax_platforms','cpu');"
           "from fsgm_tpu.cli.main import main; import sys;"
           "sys.exit(main(sys.argv[1:]))")
    for variant, extra in (("single", []), ("batched",
                                            ["--dispatch-batch", "3"])):
        out = tmp_path / ("OUT" if variant == "single" else "OUTB")
        out.mkdir()
        lst.write_text("\n".join(
            ln.replace("/OUT/", f"/{out.name}/") for ln in lines))
        cmd = [sys.executable, "-c", pre, "batch", str(lst),
               "--manifest", str(tmp_path / f"m_{variant}.jsonl"),
               "--max-disp", "8", "--backend", "xla"] + extra
        r = subprocess.run(cmd, env=env, cwd=repo, capture_output=True,
                           text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        assert rec["newly_done"] == len(shapes)
    for i in range(len(shapes)):
        a = kitti.read_disparity_png(tmp_path / "OUT" / f"d{i}.png")
        b = kitti.read_disparity_png(tmp_path / "OUTB" / f"d{i}.png")
        np.testing.assert_array_equal(a, b)
