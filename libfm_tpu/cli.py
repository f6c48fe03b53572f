"""Command-line driver with the reference's full flag surface.

Reproduces the libFM CLI (/root/reference/src/libfm/libfm.cpp:62-441):
flags -task -train -test -validation -meta -dim -regular -init_stdev -iter
-learn_rate -method -verbosity -rlog -seed -out -save_model -load_model
-relation -cache_size plus the hidden do_sampling / do_multilevel /
num_eval_cases, with the same defaults (method=mcmc, dim=1,1,8,
init_stdev=0.1, iter=100, learn_rate=0.1) and the same semantic rules:

- `als` is rewritten to mcmc with do_sampling=0 do_multilevel=0
  (libfm.cpp:135-139);
- -save_model/-load_model are rejected for MCMC (libfm.cpp:123-133);
- classification targets are binarized to +-1 (libfm.cpp:302-305);
- -regular arity is 0/1/3 for SGD and 0/1/3/(1+2G) for MCMC/ALS
  (libfm.cpp:326-385);
- -learn_rate accepts 1 or 3 values (libfm.cpp:386-404).

TPU-specific additions: -batch_size (mini-batch size; the reference is
per-row), -devices/-mesh for sharding, -dtype.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _split_list(s: str) -> list[str]:
    # reference splits on ';' and ',' (/root/reference/src/util/cmdline.h:203-236)
    out = []
    for part in s.replace(";", ",").split(","):
        part = part.strip()
        if part:
            out.append(part)
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="libfm-tpu",
        description="TPU-native factorization machines (libFM capability set)",
    )
    a = p.add_argument
    a("-task", required=False, help="r=regression, c=binary classification")
    a("-train", required=False, help="filename for training data")
    a("-test", required=False, help="filename for test data")
    a("-validation", default=None, help="filename for validation data (SGDA)")
    a("-meta", default=None, help="filename for meta information (groups)")
    a("-dim", default="1,1,8", help="'k0,k1,k2' bias, 1-way, factor dim")
    a("-regular", default="", help="'r0,r1,r2' regularization")
    a("-init_stdev", type=float, default=0.1)
    a("-iter", type=int, default=100)
    a("-learn_rate", default="0.1")
    a("-method", default="mcmc", help="sgd, sgda, als, mcmc")
    a("-verbosity", type=int, default=0)
    a("-rlog", default=None, help="write per-iteration metrics TSV")
    a("-seed", type=int, default=None)
    a("-out", default=None, help="filename for test predictions")
    a("-relation", default="", help="BS: filenames for relations")
    a(
        "-cache_size",
        default=None,
        help="host-memory budget in bytes for binary training data "
        "(reference libfm.cpp:98). SGD trains out-of-core (streaming "
        "epochs) when the binary .x exceeds it; the MCMC/ALS engines' "
        "scale axis is the device mesh (-mesh), not host streaming.",
    )
    a("-save_model", default=None)
    a("-load_model", default=None)
    a("-do_sampling", type=int, default=1)
    a("-do_multilevel", type=int, default=1)
    a("-num_eval_cases", type=int, default=None)
    # TPU-native extensions
    a("-batch_size", type=int, default=1024)
    a("-dtype", default="float32", choices=["float32", "float64", "bfloat16"])
    a(
        "-mesh",
        default=None,
        help="device mesh 'data,model' (e.g. '4,2'): shards batches over "
        "`data` and the w/V parameter tables over `model`. Applies to "
        "sgd and the vector mcmc/als engine.",
    )
    a(
        "-distributed",
        type=int,
        default=0,
        help="call jax.distributed.initialize() for multi-host runs "
        "(coordinator/process env: LIBFM_COORDINATOR, LIBFM_NUM_PROCS, "
        "LIBFM_PROC_ID, or auto-detection)",
    )
    a("-profile", default=None, help="write a jax.profiler trace to this dir")
    a(
        "-refresh_every",
        type=int,
        default=None,
        help="vector MCMC/ALS: re-predict the train cache every R-th "
        "iteration (1 = reference cadence; larger R skips the "
        "numerically-redundant refresh). Default: 8 for every run — "
        "sampled draws are part of the exact incremental cache "
        "updates, so the refresh is float-drift control either way "
        "(fm_learn_mcmc_simultaneous.h:123-124); classification "
        "resamples its probit latents every iteration from the "
        "incrementally maintained pred = e + latent.",
    )
    a(
        "-engine",
        default="vector",
        choices=["vector", "exact"],
        help="MCMC/ALS sweep engine: 'vector' = joint (w_j,v_j) draws, the "
        "TPU fast path (default; thin relational joins are materialised and "
        "swept flat, fat blocks use the BS vector engine's block-row cache "
        "algebra); 'exact' = the reference's per-coordinate scan order "
        "(relational data uses the per-factor VLDB'13 cache dance)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not (args.task and args.train and args.test):
        build_parser().print_help()
        # bare invocation (no args at all) = help, success; anything
        # else missing a required flag is a usage error
        given = sys.argv[1:] if argv is None else list(argv)
        return 0 if not given else 1

    import jax

    if args.distributed:
        from libfm_tpu.parallel.multihost import init_distributed

        init_distributed()

    import jax.numpy as jnp

    from libfm_tpu.data.dataset import DataMetaInfo, Dataset
    from libfm_tpu.data.relation import RelationData, RelationJoin
    from libfm_tpu.models.fm import (
        FMConfig,
        load_model_text,
        save_model_text,
    )
    from libfm_tpu.tasks import TASK_CLASSIFICATION, parse_task
    from libfm_tpu.utils.rlog import RLog

    method = args.method.lower()
    seed = args.seed if args.seed is not None else 1
    do_sampling = bool(args.do_sampling)
    do_multilevel = bool(args.do_multilevel)

    # reference parity: mcmc + save/load prints a warning and exits 0
    # WITHOUT training (libfm.cpp:123-133 `return 0`); als passes the
    # guard (checked before the als->mcmc rewrite) and loadModel runs
    if method == "mcmc" and args.save_model:
        print("WARNING: -save_model enabled only for SGD and ALS.")
        return 0
    if method == "mcmc" and args.load_model:
        print("WARNING: -load_model enabled only for SGD and ALS.")
        return 0
    if method == "als":  # als = mcmc without sampling / hyperprior inference
        method = "mcmc"
        do_sampling = False
        do_multilevel = False

    def _debug(ds, name):
        # verbosity dump like the reference's Data::debug
        # (/root/reference/src/libfm/src/Data.h:343-356)
        if args.verbosity > 0:
            print(
                f"{name}: num_cases={ds.num_rows}\tnum_values={ds.nnz}\t"
                f"num_features={ds.num_features}\t"
                f"min_target={ds.min_target}\tmax_target={ds.max_target}"
            )

    # -cache_size: stream SGD epochs straight from the binary pair when
    # the design matrix exceeds the host budget (the reference's
    # LargeSparseMatrixHD role, /root/reference/src/util/fmatrix.h:165-281)
    stream_train = None
    if args.cache_size and method in ("sgd", "sgda"):
        import os as _os

        xp, yp = args.train + ".x", args.train + ".y"
        budget = int(float(args.cache_size))
        if _os.path.exists(xp) and _os.path.getsize(xp) > budget:
            from libfm_tpu.data.streaming import StreamingDataset

            stream_train = StreamingDataset(
                xp, yp, entry_budget=max(1024, budget // 8)
            )
            print(
                f"Training out-of-core: {xp} "
                f"({_os.path.getsize(xp)} B > cache_size {budget} B)"
            )
    elif args.cache_size and method == "mcmc":
        # MCMC/ALS out-of-core: like the reference, needs the binary
        # pair plus its transpose on disk (libfm.cpp:141-174 reads the
        # .xt data_t when --cache_size is set); the host-side layout
        # build then streams block by block (bounded RSS) while the
        # device keeps the resident caches.
        import os as _os

        xp, yp = args.train + ".x", args.train + ".y"
        xtp = args.train + ".xt"
        budget = int(float(args.cache_size))
        if (
            _os.path.exists(xp)
            and _os.path.exists(xtp)
            and _os.path.getsize(xp) > budget
        ):
            from libfm_tpu.data.streaming import StreamingDataset

            stream_train = StreamingDataset(
                xp, yp, entry_budget=max(1024, budget // 8)
            )
            print(
                f"Training out-of-core: {xp} "
                f"({_os.path.getsize(xp)} B > cache_size {budget} B)"
            )
        elif _os.path.exists(xp) and not _os.path.exists(xtp):
            print(
                f"WARNING: -cache_size for MCMC/ALS needs the transpose "
                f"at {xtp} (build it with tools/transpose.py); loading "
                "resident."
            )
    elif args.cache_size:
        print(
            "WARNING: -cache_size streaming applies to SGD, SGDA, and "
            "MCMC/ALS."
        )

    # relations force the main table resident (the BS engines join
    # against it); the relation block tables themselves load through the
    # bounded streaming reader below, matching the reference's wiring of
    # cache_size into RelationData (relation.h:62-78)
    rel_names = _split_list(args.relation)
    if rel_names and stream_train is not None:
        print(
            "NOTE: -relation with -cache_size: relation tables load "
            "through the bounded cache; the (typically tiny) BS main "
            "table loads resident."
        )
        stream_train = None

    if stream_train is None:
        print("Loading train...")
        train = Dataset.load(args.train)
        _debug(train, "train")
    else:
        train = None

    # the TEST set can stream too (the reference pushes test data through
    # the same HD cache, libfm.cpp:141-174); the vector MCMC/ALS engine
    # uploads its row chunks without a resident host copy
    stream_test = None
    if args.cache_size and method == "mcmc" and not rel_names:
        import os as _os

        xpt, ypt = args.test + ".x", args.test + ".y"
        budget = int(float(args.cache_size))
        if _os.path.exists(xpt) and _os.path.getsize(xpt) > budget:
            from libfm_tpu.data.streaming import StreamingDataset

            stream_test = StreamingDataset(
                xpt, ypt, entry_budget=max(1024, budget // 8)
            )
            print(
                f"Test set out-of-core: {xpt} "
                f"({_os.path.getsize(xpt)} B > cache_size {budget} B)"
            )
    if stream_test is None:
        print("Loading test...")
        test = Dataset.load(args.test)
        _debug(test, "test")
    else:
        test = stream_test
    validation = None
    if args.validation:
        if method != "sgda":
            print(
                "WARNING: Validation data is only used for SGDA. The data "
                "is ignored."
            )
        else:
            # the validation set streams under -cache_size too (the
            # reference builds EVERY Data with the same bounded cache,
            # libfm.cpp:141-174): SGDA's lambda steps read it strictly
            # round-robin, so one bounded window suffices
            _vxp, _vyp = args.validation + ".x", args.validation + ".y"
            import os as _os

            if (
                args.cache_size
                and stream_train is not None
                and _os.path.exists(_vxp)
                and _os.path.getsize(_vxp) > int(float(args.cache_size))
            ):
                from libfm_tpu.data.streaming import StreamingDataset

                validation = StreamingDataset(
                    _vxp, _vyp,
                    entry_budget=max(
                        1024, int(float(args.cache_size)) // 8
                    ),
                )
                print(
                    f"Validation out-of-core: {_vxp} "
                    f"({_os.path.getsize(_vxp)} B > cache_size "
                    f"{int(float(args.cache_size))} B)"
                )
            else:
                validation = Dataset.load(args.validation)

    # relations (BS); with -cache_size the block tables read through the
    # bounded streaming windows (reference parity, relation.h:62-78)
    rel_budget = (
        max(1024, int(float(args.cache_size)) // 8) if args.cache_size else None
    )
    relations = []
    for rn in rel_names:
        rd = RelationData.load(rn, entry_budget=rel_budget)
        relations.append(rd)
        train.relations.append(RelationJoin.load(rd, rn + ".train", train.num_rows))
        test.relations.append(RelationJoin.load(rd, rn + ".test", test.num_rows))

    # joined meta (libfm.cpp:199-243)
    train_nf = (
        train.num_features if train is not None else stream_train.num_features
    )
    num_all_attribute = max(train_nf, test.num_features)
    if validation is not None:
        num_all_attribute = max(num_all_attribute, validation.num_features)
    # a targets-only file (zero features, e.g. a BS main table used
    # without -relation) still needs a non-empty parameter table
    num_all_attribute = max(num_all_attribute, 1)
    meta_main = DataMetaInfo(num_all_attribute)
    if args.meta:
        meta_main.load_groups(args.meta)
    for rd in relations:
        rd.attr_offset = num_all_attribute
        num_all_attribute += rd.num_features
    attr_group = np.zeros(num_all_attribute, dtype=np.int32)
    attr_group[: len(meta_main.attr_group)] = meta_main.attr_group
    group_cntr = meta_main.num_attr_groups
    for rd in relations:
        sl = slice(rd.attr_offset, rd.attr_offset + rd.num_features)
        attr_group[sl] = group_cntr + rd.meta.attr_group
        group_cntr += rd.meta.num_attr_groups
    num_groups = group_cntr

    dims = [int(x) for x in _split_list(args.dim)]
    assert len(dims) == 3, "-dim expects 'k0,k1,k2'"
    dtype = {"float32": jnp.float32, "float64": jnp.float64, "bfloat16": jnp.bfloat16}[
        args.dtype
    ]
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    reg = [float(x) for x in _split_list(args.regular)]
    reg3 = (reg + reg * 3)[:3] if len(reg) in (1,) else (reg if len(reg) == 3 else [0.0, 0.0, 0.0])

    cfg = FMConfig(
        num_features=num_all_attribute,
        num_factors=dims[2],
        use_bias=dims[0] != 0,
        use_linear=dims[1] != 0,
        init_stdev=args.init_stdev,
        reg0=reg3[0],
        regw=reg3[1],
        regv=reg3[2],
        dtype=dtype,
    )

    task = parse_task(args.task)
    if task == TASK_CLASSIFICATION:
        (train if train is not None else stream_train).binarize_targets()
        test.binarize_targets()
        if validation is not None:
            validation.binarize_targets()

    rlog = RLog(path=args.rlog) if args.rlog else None

    import contextlib

    def maybe_profile():
        if args.profile:
            from libfm_tpu.utils.profiling import trace

            return trace(args.profile)
        return contextlib.nullcontext()

    lr = [float(x) for x in _split_list(args.learn_rate)]
    assert len(lr) in (1, 3), "-learn_rate expects 1 or 3 values"
    learn_rates = tuple(lr) if len(lr) == 3 else (lr[0],) * 3

    def _verbosity_dump():
        """-verbosity > 0 model/learner dump: fm.debug() + fml->debug()
        (libfm.cpp:409-412; bodies at fm_model.h:80-89,
        fm_learn.h:107-111, fm_learn_sgd.h:71-74, adapt_reg.h:357-360,
        fm_learn_mcmc.h:1203-1209)."""
        if args.verbosity <= 0:
            return
        src = train if train is not None else stream_train
        print(f"num_attributes={num_all_attribute}")
        print(f"use w0={dims[0]}")
        print(f"use w1={dims[1]}")
        print(f"dim v ={dims[2]}")
        print(f"reg_w0={reg3[0]:g}")
        print(f"reg_w={reg3[1]:g}")
        print(f"reg_v={reg3[2]:g}")
        print(f"init ~ N(0,{args.init_stdev:g})")
        if method == "sgda":
            print("method=sgda")
        if method in ("sgd", "sgda"):
            print(f"num_iter={args.iter}")
        print(f"task={task}")
        print(f"min_target={src.min_target:g}")
        print(f"max_target={src.max_target:g}")
        if method == "mcmc":
            print(f"do_multilevel={int(do_multilevel)}")
            print(f"do_sampling={int(do_sampling)}")
            nec = (
                args.num_eval_cases
                if args.num_eval_cases is not None
                else test.num_rows
            )
            print(f"num_eval_cases={nec}")

    mesh = None
    if args.mesh:
        from libfm_tpu.parallel.mesh import make_mesh

        parts = [int(x) for x in _split_list(args.mesh)]
        assert len(parts) in (1, 2), "-mesh expects 'data' or 'data,model'"
        data_ax = parts[0]
        model_ax = parts[1] if len(parts) == 2 else 1
        ndev = len(jax.devices())
        if data_ax * model_ax > ndev:
            print(
                f"ERROR: -mesh {args.mesh} needs {data_ax * model_ax} "
                f"devices but only {ndev} are available"
            )
            return 1
        mesh = make_mesh(
            data=data_ax, model=model_ax,
            devices=jax.devices()[: data_ax * model_ax],
        )

    if method == "sgd":
        from libfm_tpu.learners.sgd import SGDLearner

        assert len(reg) in (0, 1, 3), "-regular expects 0, 1 or 3 values"
        if mesh is not None and stream_train is not None:
            # the streaming epoch is a single-device loop; a silent
            # fall-through would ignore the mesh AND feed single-device
            # params to the sharded eval step
            print(
                "WARNING: -mesh is not supported together with "
                "-cache_size streaming; training unsharded."
            )
            mesh = None
        if mesh is not None:
            from libfm_tpu.parallel.sharded_sgd import ShardedSGDLearner

            learner = ShardedSGDLearner(
                cfg,
                mesh=mesh,
                task=task,
                num_iter=args.iter,
                learn_rates=learn_rates,
                batch_size=args.batch_size,
                seed=seed,
                rlog=rlog,
            )
        else:
            learner = SGDLearner(
                cfg,
                task=task,
                num_iter=args.iter,
                learn_rates=learn_rates,
                batch_size=args.batch_size,
                seed=seed,
                rlog=rlog,
            )
        learner.init_params()
        if args.load_model:
            loaded = load_model_text(cfg, args.load_model)
            if loaded is None:
                print("WARNING: malformed model file. Nothing will be loaded.")
            else:
                if learner.cfg.num_features != cfg.num_features:
                    # mesh padding: grow the loaded tables to the padded n
                    from libfm_tpu.models.fm import FMParams

                    pad = learner.cfg.num_features - cfg.num_features
                    loaded = FMParams(
                        w0=loaded.w0,
                        w=jnp.pad(loaded.w, (0, pad)),
                        v=jnp.pad(loaded.v, ((0, pad), (0, 0))),
                    )
                learner.params = loaded
        if rlog:
            rlog.init()
        _verbosity_dump()
        with maybe_profile():
            if stream_train is not None:
                learner.learn_stream(stream_train, test)
            else:
                learner.learn(train, test)
        # the last epoch's metrics ARE the final-parameter evaluation;
        # reuse them instead of re-uploading both datasets
        hist = getattr(learner, "history", None)
        if stream_train is not None:
            te_f = hist[-1][1] if hist else learner.evaluate(test)
            print(f"Final\tTest={te_f:.6g}")
        else:
            if hist:
                tr_f, te_f = hist[-1][0], hist[-1][1]
            else:
                tr_f, te_f = learner.evaluate(train), learner.evaluate(test)
            print(f"Final\tTrain={tr_f:.6g}\tTest={te_f:.6g}")
        preds = learner.predict(test) if args.out else None
        params_out = learner.params
    elif method == "sgda":
        from libfm_tpu.learners.sgda import SGDALearner

        assert validation is not None, "SGDA requires -validation"
        if mesh is not None:
            print("WARNING: -mesh is not supported for SGDA; ignoring.")
        learner = SGDALearner(
            cfg,
            attr_group=attr_group,
            task=task,
            num_iter=args.iter,
            learn_rates=learn_rates,
            batch_size=args.batch_size,
            seed=seed,
            rlog=rlog,
        )
        learner.init_params()
        if args.load_model:
            loaded = load_model_text(cfg, args.load_model)
            if loaded is not None:
                learner.params = loaded
        if rlog:
            rlog.init()
        _verbosity_dump()
        with maybe_profile():
            if stream_train is not None:
                learner.learn_stream(stream_train, test, validation)
            else:
                learner.learn(train, test, validation)
        hist = getattr(learner, "history", None)
        if stream_train is not None and hist:
            print(f"Final\tTest={hist[-1][1]:.6g}")
        elif hist:
            print(f"Final\tTrain={hist[-1][0]:.6g}\tTest={hist[-1][1]:.6g}")
        else:
            print(
                f"Final\tTrain={learner.evaluate(train):.6g}"
                f"\tTest={learner.evaluate(test):.6g}"
            )
        preds = learner.predict(test) if args.out else None
        params_out = learner.params
    elif method == "mcmc":
        extra = {}
        if args.engine == "vector":
            # relational (BS) data is handled inside the vector learner:
            # thin joins are expanded to a flat design matrix and swept
            # by the joint-draw engine; fat blocks fall back to the
            # exact BS cache algorithm (mcmc_vector.py learn()).
            from libfm_tpu.learners.mcmc_vector import (
                MCMCVectorLearner as MCMCLearner,
            )

            extra["mesh"] = mesh
            extra["refresh_every"] = args.refresh_every
        else:
            from libfm_tpu.learners.mcmc import MCMCLearner

            if mesh is not None:
                print(
                    "WARNING: -mesh applies to the vector engine only; "
                    "ignoring."
                )
            if args.refresh_every not in (None, 1):
                print(
                    "WARNING: -refresh_every applies to the vector "
                    "engine only; ignoring."
                )

        learner = MCMCLearner(
            cfg,
            task=task,
            num_iter=args.iter,
            do_sample=do_sampling,
            do_multilevel=do_multilevel,
            num_eval_cases=args.num_eval_cases,
            seed=seed,
            rlog=rlog,
            attr_group=attr_group,
            dtype=dtype,
            **extra,
        )
        learner.set_regularization(reg, num_groups)
        if args.load_model:
            # only reachable for `als` (the mcmc guard above exits);
            # the reference loads the model there (libfm.cpp:262-268)
            # and then re-randomises w (:283) — warm_start keeps w0/V
            print("Reading FM model...")
            loaded = load_model_text(cfg, args.load_model)
            if loaded is None:
                print(
                    "WARNING: malformed model file. Nothing will be loaded."
                )
            else:
                learner.warm_start = loaded
        learner.register_log_fields()
        if rlog:
            rlog.init()
        _verbosity_dump()
        with maybe_profile():
            learner.learn(
                stream_train if stream_train is not None else train, test
            )
        preds = learner.predict(test) if args.out else None
        # -save_model passed the guard above only for `als` (the
        # reference supports it there: libfm.cpp:123-133, 431-434);
        # ALS params are the deterministic final solution
        params_out = learner.get_params() if args.save_model else None
    else:
        print(f"ERROR: unknown method {args.method}")
        return 1

    if args.verbosity > 0:
        # end-of-learn memory accounting (MemoryLog analog, memory.h:31-62)
        from libfm_tpu.utils.profiling import print_peak_memory_report

        print_peak_memory_report()
    if args.out and preds is not None:
        np.savetxt(args.out, preds, fmt="%.6g")
    if args.save_model and params_out is not None:
        print(f"Writing FM model to {args.save_model}")
        save_model_text(params_out, cfg, args.save_model)
    if rlog:
        rlog.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
