"""Observability utilities: metric logging, step timing, profiler trace,
CSV artifact writers (SURVEY.md §5 tracing/metrics plan)."""

import csv
import json
import os
import time

import numpy as np


def test_metric_logger_jsonl(tmp_path):
    from causalvae_tpu.utils.metrics import MetricLogger

    logger = MetricLogger(str(tmp_path))
    logger.log(0, {"loss": np.float32(2.5), "kld": 1.0})
    logger.log(1, {"loss": 2.0}, prefix="val_")
    logger.close()
    lines = open(os.path.join(str(tmp_path), "metrics.jsonl")).read().splitlines()
    recs = [json.loads(l) for l in lines]
    assert recs[0] == {"step": 0, "loss": 2.5, "kld": 1.0}
    assert recs[1] == {"step": 1, "val_loss": 2.0}
    assert logger.history == recs


def test_step_timer_excludes_warmup():
    from causalvae_tpu.utils.metrics import StepTimer

    t = StepTimer(warmup=2)
    for _ in range(3):
        t.tick(10)
        time.sleep(0.01)
    assert t.images == 10  # only post-warmup steps counted
    assert t.images_per_sec > 0


def test_profile_trace_writes_artifacts(tmp_path):
    import jax
    import jax.numpy as jnp

    from causalvae_tpu.utils.metrics import profile_trace

    d = os.path.join(str(tmp_path), "trace")
    with profile_trace(d):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    found = [f for root, _, fs in os.walk(d) for f in fs]
    assert found, "profiler produced no trace files"
    # no-op path
    with profile_trace(None):
        pass


def test_csv_writers(tmp_path):
    from causalvae_tpu.utils.metrics import write_csv, write_matrix_csv

    p1 = os.path.join(str(tmp_path), "rows.csv")
    write_csv(p1, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    rows = list(csv.DictReader(open(p1)))
    assert rows == [{"a": "1", "b": "x"}, {"a": "2", "b": "y"}]

    p2 = os.path.join(str(tmp_path), "mat.csv")
    write_matrix_csv(p2, np.arange(6).reshape(2, 3), ["r0", "r1"],
                     ["c0", "c1", "c2"], corner="feat")
    lines = open(p2).read().splitlines()
    assert lines[0] == "feat,c0,c1,c2"
    assert lines[1].startswith("r0,0,1,2")
