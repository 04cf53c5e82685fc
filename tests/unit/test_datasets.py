"""KITTI 2012/2015 dataset adapters over a synthetic devkit tree
(SURVEY.md §1 L0): directory iteration, GT loading via the codecs, and the
`cli kitti` end-to-end drive — so real-data eval works unmodified the day
a dataset is mountable."""

import json

import numpy as np
import pytest

from fsgm_tpu.io import kitti
from fsgm_tpu.io.datasets import KittiStereoDataset, KittiFlowDataset
from fsgm_tpu.io.images import save_gray
from fsgm_tpu.io.synthetic import random_dot_stereo, constant_flow_pair


def _make_stereo_tree(root, year, n=2, h=64, w=96, d=16):
    img1 = "image_2" if year == 2015 else "image_0"
    img2 = "image_3" if year == 2015 else "image_1"
    gt = "disp_occ_0" if year == 2015 else "disp_occ"
    tr = root / "training"
    for sub in (img1, img2, gt):
        (tr / sub).mkdir(parents=True)
    gts = []
    for i in range(n):
        il, ir, dgt = random_dot_stereo(h, w, d, seed=i)
        save_gray(tr / img1 / f"{i:06d}_10.png", il)
        save_gray(tr / img2 / f"{i:06d}_10.png", ir)
        kitti.write_disparity_png(tr / gt / f"{i:06d}_10.png",
                                  dgt.astype(np.float64))
        gts.append((il, ir, dgt))
    return gts


def _make_flow_tree(root, year, n=2, h=48, w=64):
    img = "image_2" if year == 2015 else "image_0"
    tr = root / "training"
    (tr / img).mkdir(parents=True)
    (tr / "flow_occ").mkdir(parents=True)
    gts = []
    for i in range(n):
        i1, i2, fgt = constant_flow_pair(h, w, 2, -1, seed=i)
        save_gray(tr / img / f"{i:06d}_10.png", i1)
        save_gray(tr / img / f"{i:06d}_11.png", i2)
        valid = np.ones((h, w), dtype=bool)
        kitti.write_flow_png(tr / "flow_occ" / f"{i:06d}_10.png", fgt,
                             valid)
        gts.append((i1, i2, fgt))
    return gts


@pytest.mark.parametrize("year", [2012, 2015])
def test_stereo_dataset_iteration(tmp_path, year):
    gts = _make_stereo_tree(tmp_path, year)
    ds = KittiStereoDataset(tmp_path, year=year)
    assert len(ds) == 2
    for i, smp in enumerate(ds):
        il, ir, dgt = gts[i]
        assert smp.name == f"{i:06d}"
        np.testing.assert_array_equal(smp.left, il)
        np.testing.assert_array_equal(smp.right, ir)
        # GT round-trips through the /256 PNG encoding exactly for ints
        np.testing.assert_allclose(smp.gt[smp.gt_valid],
                                   dgt[smp.gt_valid], atol=1 / 128)
    # index by id and by position agree
    np.testing.assert_array_equal(ds[0].left, ds["000000"].left)


@pytest.mark.parametrize("year", [2012, 2015])
def test_flow_dataset_iteration(tmp_path, year):
    gts = _make_flow_tree(tmp_path, year)
    ds = KittiFlowDataset(tmp_path, year=year)
    assert len(ds) == 2
    for i, smp in enumerate(ds):
        i1, i2, fgt = gts[i]
        np.testing.assert_array_equal(smp.img1, i1)
        np.testing.assert_array_equal(smp.img2, i2)
        np.testing.assert_allclose(smp.gt, fgt, atol=1 / 32)
        assert smp.gt_valid.all()


def test_missing_layout_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        KittiStereoDataset(tmp_path, year=2015)


def test_cli_kitti_stereo_end_to_end(tmp_path, capsys):
    """`cli kitti stereo` over the synthetic tree: per-frame JSONL with
    D1-all, summary line, predictions written in devkit naming."""
    from fsgm_tpu.cli.main import main

    _make_stereo_tree(tmp_path, 2015, n=2)
    outdir = tmp_path / "pred"
    rc = main(["kitti", "stereo", str(tmp_path), "--year", "2015",
               "--max-disp", "16", "--backend", "xla",
               "--output-dir", str(outdir)])
    assert rc == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    summary = lines[-1]
    assert summary["frames"] == 2 and summary["scored"] == 2
    assert summary["d1_all"] < 0.30          # random-dot is easy
    assert (outdir / "000000_10.png").exists()
    # predictions re-read through the codec == what eval scored
    pred = kitti.read_disparity_png(outdir / "000000_10.png")
    assert pred.shape == (64, 96)


def test_cli_kitti_flow_end_to_end(tmp_path, capsys):
    from fsgm_tpu.cli.main import main

    _make_flow_tree(tmp_path, 2012, n=1)
    rc = main(["kitti", "flow", str(tmp_path), "--year", "2012",
               "--backend", "xla"])
    assert rc == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["scored"] == 1
    assert "fl_all" in lines[-1]
