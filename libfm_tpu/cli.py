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
    a("-cache_size", default=None, help="accepted for compatibility (unused)")
    a("-save_model", default=None)
    a("-load_model", default=None)
    a("-do_sampling", type=int, default=1)
    a("-do_multilevel", type=int, default=1)
    a("-num_eval_cases", type=int, default=None)
    # TPU-native extensions
    a("-batch_size", type=int, default=1024)
    a("-dtype", default="float32", choices=["float32", "float64", "bfloat16"])
    a("-mesh", default=None, help="mesh spec 'data,model' e.g. '4,2'")
    a("-profile", default=None, help="write a jax.profiler trace to this dir")
    a(
        "-engine",
        default="vector",
        choices=["vector", "exact"],
        help="MCMC/ALS sweep engine: 'vector' = joint (w_j,v_j) draws, the "
        "TPU fast path (default); 'exact' = the reference's per-coordinate "
        "scan order (relational data always uses 'exact')",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not (args.task and args.train and args.test):
        build_parser().print_help()
        return 0 if argv in (None, []) else 1

    import jax
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

    print("Loading train...")
    train = Dataset.load(args.train)
    _debug(train, "train")
    print("Loading test...")
    test = Dataset.load(args.test)
    _debug(test, "test")
    validation = None
    if args.validation:
        if method != "sgda":
            print(
                "WARNING: Validation data is only used for SGDA. The data "
                "is ignored."
            )
        else:
            validation = Dataset.load(args.validation)

    # relations (BS)
    rel_names = _split_list(args.relation)
    relations = []
    for rn in rel_names:
        rd = RelationData.load(rn)
        relations.append(rd)
        train.relations.append(RelationJoin.load(rd, rn + ".train", train.num_rows))
        test.relations.append(RelationJoin.load(rd, rn + ".test", test.num_rows))

    # joined meta (libfm.cpp:199-243)
    num_all_attribute = max(train.num_features, test.num_features)
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
        train.binarize_targets()
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

    if method == "sgd":
        from libfm_tpu.learners.sgd import SGDLearner

        assert len(reg) in (0, 1, 3), "-regular expects 0, 1 or 3 values"
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
                learner.params = loaded
        if rlog:
            rlog.init()
        with maybe_profile():
            learner.learn(train, test)
        print(f"Final\tTrain={learner.evaluate(train):.6g}\tTest={learner.evaluate(test):.6g}")
        preds = learner.predict(test) if args.out else None
        params_out = learner.params
    elif method == "sgda":
        from libfm_tpu.learners.sgda import SGDALearner

        assert validation is not None, "SGDA requires -validation"
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
        with maybe_profile():
            learner.learn(train, test, validation)
        print(f"Final\tTrain={learner.evaluate(train):.6g}\tTest={learner.evaluate(test):.6g}")
        preds = learner.predict(test) if args.out else None
        params_out = learner.params
    elif method == "mcmc":
        if args.engine == "vector" and not train.relations:
            from libfm_tpu.learners.mcmc_vector import (
                MCMCVectorLearner as MCMCLearner,
            )
        else:
            from libfm_tpu.learners.mcmc import MCMCLearner

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
        )
        learner.set_regularization(reg, num_groups)
        learner.register_log_fields()
        if rlog:
            rlog.init()
        with maybe_profile():
            learner.learn(train, test)
        preds = learner.predict(test) if args.out else None
        params_out = None
    else:
        print(f"ERROR: unknown method {args.method}")
        return 1

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
