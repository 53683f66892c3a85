"""Tests for TUM association + the --gt evaluation CLI path."""
import os

import numpy as np
import pytest

from revo_tpu.io.associate import associate, read_file_list, write_associations


class TestAssociate:
    def test_greedy_nearest(self):
        first = {0.00: "a0", 0.10: "a1", 0.20: "a2"}
        second = {0.005: "b0", 0.11: "b1", 0.50: "b2"}
        m = associate(first, second)
        assert m == [(0.00, 0.005), (0.10, 0.11)]

    def test_max_difference(self):
        first = {0.0: "a"}
        second = {0.05: "b"}
        assert associate(first, second, max_difference=0.02) == []
        assert associate(first, second, max_difference=0.1) == [(0.0, 0.05)]

    def test_write_associations(self, tmp_path):
        with open(os.path.join(tmp_path, "rgb.txt"), "w") as f:
            f.write("# comment\n1.00 rgb/1.png\n1.03 rgb/2.png\n")
        with open(os.path.join(tmp_path, "depth.txt"), "w") as f:
            f.write("1.005 depth/1.png\n1.035 depth/2.png\n")
        n = write_associations(str(tmp_path))
        assert n == 2
        lines = open(os.path.join(tmp_path, "associate.txt")).read().splitlines()
        assert lines[0].split() == ["1.000000", "rgb/1.png", "1.005000", "depth/1.png"]


class TestGTEvaluation:
    def test_dataset_run_with_gt(self, tmp_path, capsys):
        """Full dataset CLI with raw rgb.txt/depth.txt + groundtruth.txt:
        auto-association + in-repo ATE."""
        import cv2
        import jax.numpy as jnp

        from revo_tpu import lie
        from revo_tpu.io.synthetic import SyntheticScene, render_sequence
        from revo_tpu.io.tum import write_tum_trajectory
        from test_solver import small_cfg
        import revo_tpu.run as runmod

        cfg = small_cfg()
        ds = os.path.join(tmp_path, "seq")
        os.makedirs(os.path.join(ds, "rgb"))
        os.makedirs(os.path.join(ds, "depth"))
        rgb_lines, depth_lines, gts, stamps = [], [], [], []
        for i, (gray, depth, T, ts) in enumerate(
            render_sequence(SyntheticScene(), cfg.camera, 8, seed=7)
        ):
            cv2.imwrite(
                os.path.join(ds, f"rgb/{i}.png"),
                np.stack([gray] * 3, -1).astype(np.uint8),
            )
            cv2.imwrite(
                os.path.join(ds, f"depth/{i}.png"),
                (depth * 5000).astype(np.uint16),
            )
            rgb_lines.append(f"{ts:.6f} rgb/{i}.png")
            depth_lines.append(f"{ts:.6f} depth/{i}.png")
            gts.append(T)
            stamps.append(ts)
        open(os.path.join(ds, "rgb.txt"), "w").write("\n".join(rgb_lines))
        open(os.path.join(ds, "depth.txt"), "w").write("\n".join(depth_lines))
        gt_arr = np.stack(gts)
        qs = np.asarray(
            lie.quaternion_from_matrix(jnp.asarray(gt_arr[:, :3, :3]))
        )
        write_tum_trajectory(
            os.path.join(ds, "groundtruth.txt"), stamps, gt_arr[:, :3, 3], qs
        )

        dsy = os.path.join(tmp_path, "ds.yaml")
        open(dsy, "w").write(
            f"Camera.fx: 150.0\nCamera.fy: 150.0\nCamera.cx: 80.0\n"
            f"Camera.cy: 60.0\nCamera.width: 160\nCamera.height: 120\n"
            f'MainFolder: "{tmp_path}/"\nDatasets: "seq"\n'
        )
        sty = os.path.join(tmp_path, "settings.yaml")
        open(sty, "w").write("DO_OUTPUT_POSES: 1\n")
        rc = runmod.main(
            [sty, dsy, "--out", str(tmp_path), "--gt", "groundtruth.txt"]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "generated associate.txt: 8 pairs" in out
        assert "ATE-RMSE vs GT" in out
        # parse the reported ATE and require sub-centimetre
        line = [l for l in out.splitlines() if "ATE-RMSE vs GT" in l][0]
        ate_cm = float(line.split(":")[1].strip().split()[0])
        assert ate_cm < 1.0, line
