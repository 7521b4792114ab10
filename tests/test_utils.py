"""Utility tests: timing/ETA, metric logging output, plotting smoke."""

import numpy as np

from conftest import make_grid_mesh

from bsms_gnn_tpu.utils.timing import TicToc, simple_timeit
from bsms_gnn_tpu.utils.logging import MetricLogger, board_loss, print_error_table
from bsms_gnn_tpu.utils.plotting import plot_fields, plot_rollout_error


def test_tictoc_and_eta(capsys):
    t = TicToc()
    t.tic("x")
    assert t.toc("x") >= 0
    t.tic("run")
    t.estimate_time("run", 0.5)
    out = capsys.readouterr().out
    assert "remaining" in out and "50.00%" in out


def test_simple_timeit():
    dt = simple_timeit(lambda: np.ones(10), tries=3, warmup=1)
    assert dt >= 0


def test_logging_console(capsys):
    logger = MetricLogger(board=False)
    board_loss(logger, "train", 10, 0.5)
    print_error_table("train", 10, [0.1, 0.2], [0.01, 0.02])
    out = capsys.readouterr().out
    assert "[train] step 10" in out
    assert "rel_err_mean" in out
    logger.finish()


def test_plot_fields_and_rollout(tmp_path):
    pos, cells = make_grid_mesh(6, 6)
    rng = np.random.default_rng(0)
    pred = rng.standard_normal((pos.shape[0], 2))
    tar = rng.standard_normal((pos.shape[0], 2))
    p1 = str(tmp_path / "fields.png")
    fig = plot_fields(pos, cells, pred, tar, ["vx", "vy"], save_path=p1)
    if fig is not None:  # matplotlib available
        import os

        assert os.path.exists(p1)
    p2 = str(tmp_path / "err.png")
    plot_rollout_error(rng.random((2, 30)), save_path=p2)
