"""Typed configuration + CLI.

Re-design of reference ``graphslim/config.py`` (click CLI at ``:260-399``,
``method_config`` ``:240-257``, ``setting_config`` ``:209-236``).  Differences
by design (SURVEY.md §7 'mutable-args discipline'):

* ``Args`` is a dataclass; methods never mutate it mid-run — derived
  configs are built with :func:`dataclasses.replace` so jit caches stay sane.
* Precedence matches the reference: method defaults (``METHOD_CONFIGS``) →
  setting rules → explicit command-line flags win (``config.py:381-386``),
  with ``init`` protected from method-config override (``config.py:30-35``).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
from typing import Any, Optional

from graphslim_tpu.method_configs import METHOD_CONFIGS

log = logging.getLogger("graphslim_tpu")


@dataclasses.dataclass
class Args:
    # --- common ---------------------------------------------------------
    dataset: str = "cora"
    method: str = "kcenter"
    setting: Optional[str] = None          # trans | ind (forced per dataset)
    split: str = "fixed"
    reduction_rate: float = -1.0
    seed: int = 1
    run_reduction: int = 3
    verbose: bool = False
    save_path: str = "checkpoints"
    load_path: Optional[str] = None        # dataset dir (None → synthetic)
    pre_norm: bool = True
    agg: bool = False
    multi_label: bool = False
    attack: Optional[str] = None
    ptb_r: float = 0.25
    prbcd_epochs: int = 120                # PRBCD ascent epochs
    prbcd_fine_tune: int = 30              # last epochs without resampling
    prbcd_block: int = 250_000             # candidate block size
    # --- reduction / condensation --------------------------------------
    epochs: int = 1000
    hidden: int = 256
    nlayers: int = 2
    dropout: float = 0.0
    lr: float = 0.01
    weight_decay: float = 0.0
    condense_model: str = "SGC"
    dis_metric: str = "ours"
    lr_adj: float = 1e-4
    lr_feat: float = 1e-4
    optim: str = "Adam"
    threshold: float = 0.0
    ntrans: int = 1
    trans_layers: int = 2                  # SGFormer transformer depth
    with_bn: bool = False
    outer_loop: int = 10
    inner_loop: int = 1
    init: str = "random"
    alpha: float = 0.1
    activation: str = "relu"
    soft_label: int = 0
    with_structure: int = 1
    batch_adj: int = 1
    mx_size: int = 100
    ts: int = 4                            # t-spanner stretch
    feat_alpha: float = 10.0
    smoothness_alpha: float = 0.1
    eigen_k: int = 60
    ratio: float = 0.8
    lr_eigenvec: float = 0.01
    gamma: float = 0.5
    e1: int = 10                           # GDEM eigenvec steps
    e2: int = 15                           # GDEM feat steps
    # GECC
    agg_alpha: float = 0.9
    agg_beta: float = 0.9
    agg_gamma: float = -0.1
    fuzziness: float = 1.3
    rep_fuzz: int = 50
    depth: int = 2
    balance_alpha: int = 1
    beta: float = 0.1
    # GDEM large-graph eigensolver: auto | host (ARPACK) | device
    # (Chebyshev-filtered subspace iteration on the accelerator,
    # residual-gated with host fallback; reduce/gdem._eigsh_smallest)
    eigen_backend: str = "auto"
    coarsen_strategy: str = "greedy"
    # proximity-measure override for the matching coarseners (reference
    # get_proximity_measure names: heavy_edge, heavy_edge_degree,
    # algebraic_JC, algebraic_GS, affinity_GS, min_expected_loss,
    # min_expected_gradient_loss, rss, rss_lanczos, rss_cheby); empty =
    # each method's own default
    coarsen_measure: str = ""
    no_buff: bool = False
    # trajectory methods (SFGC/GEOM)
    lr_student: float = 0.5
    lr_teacher: float = 0.4
    wd_teacher: float = 0.0
    mom_teacher: float = 0.0
    teacher_epochs: int = 800
    expert_epochs: int = 1500
    syn_steps: int = 500
    start_epoch: int = 30
    num_experts: int = 20
    lr_y: float = 5e-5
    max_start_epoch: int = 200
    max_start_epoch_s: int = 50
    min_start_epoch: int = 0
    lr_coreset: float = 0.01
    coreset_epochs: int = 1200
    optim_lr: int = 0
    T: int = 1500
    scheduler: str = "geom"
    lam: float = 0.75
    # SGDD
    opt_scale: float = 1e-11
    ep_ratio: float = 0.5
    sinkhorn_iter: int = 10
    # GCSNTK
    ridge: float = 1.0
    K: int = 2
    L: int = 2
    k: int = 2
    scale: str = "average"
    adj: bool = False
    # SimGC
    # (lr_teacher shared above)
    # --- evaluation -----------------------------------------------------
    run_eval: int = 10
    run_inter_eval: int = 3
    eval_interval: int = 100
    eval_epochs: int = 300
    eval_model: str = "GCN"
    eval_wd: float = 0.0
    eval_loss: str = "CE"
    eval_whole: bool = False
    # --- distributed ----------------------------------------------------
    dist_devices: int = 0   # >1: shard gradient matching over a mesh
    # --- numerics -------------------------------------------------------
    # Matmul precision for reduce(): None = backend default (TPU lowers
    # f32 matmuls to bf16 multiplies).  Nested-grad condensation with a
    # learned structure generator (gcond/sgdd/simgc at small n_syn) is
    # precision-sensitive: measured +0.14 accuracy at identical budget
    # with 'highest' on the synth-hard leaderboard (docs/PERF.md r5).
    matmul_precision: Optional[str] = None   # 'highest'|'high'|'default'
    # --- profiling ------------------------------------------------------
    profile: bool = False   # capture a jax.profiler trace of reduce()
    resume: bool = False    # resume condensation from its last state ckpt
    # --- tracking -------------------------------------------------------
    wandb: bool = False
    wandb_project: str = "graphslim_tpu"
    wandb_run_name: Optional[str] = None
    wandb_required: bool = False
    # --- derived (filled by finalize) -----------------------------------
    metric: str = "accuracy"
    checkpoints: tuple = ()
    origin_r: float = -1.0

    def replace(self, **kw) -> "Args":
        return dataclasses.replace(self, **kw)


REPRESENTATIVE_R = {
    # reference config.py:210-222
    "cora": 0.5, "citeseer": 0.5, "pubmed": 0.1, "flickr": 0.01,
    "reddit": 0.001, "ogbn-arxiv": 0.01, "yelp": 0.001, "amazon": 0.002,
    "synth-small": 0.25, "synth-ind-small": 0.25,
}

TRANS_DATASETS = {"cora", "citeseer", "pubmed", "ogbn-arxiv", "synth-small",
                  "photo", "computers", "cs", "physics", "dblp"}
IND_DATASETS = {"flickr", "reddit", "amazon", "yelp", "synth-ind-small"}


# Synthetic test twins inherit their real counterpart's method configs
# (the calibrated synth-hard twin mirrors cora's supervision regime) —
# without this, twin runs fall back to Args defaults (inner_loop=1,
# outer_loop=10), which leaves with-structure condensation badly
# undertrained (round-3 finding: gcond at paper config scores 0.807 on
# synth-hard vs 0.46-0.58 at smoke defaults).
_DATASET_ALIASES = {"synth-small": "cora", "synth-hard": "cora"}


def apply_method_config(args: Args, explicit: set[str]) -> Args:
    """Overlay METHOD_CONFIGS[method][dataset]; explicit CLI flags and the
    protected ``init`` key win (reference ``config.py:30-35,381-386``)."""
    mconf = METHOD_CONFIGS.get(args.method, {})
    dname = args.dataset if args.dataset in mconf \
        else _DATASET_ALIASES.get(args.dataset, args.dataset)
    conf = mconf.get(dname, {})
    updates: dict[str, Any] = {}
    for key, value in conf.items():
        if key == "init" and "init" in explicit:
            continue
        if key in explicit:
            continue
        if hasattr(args, key):
            updates[key] = value
    if args.method == "msgc" and "batch_adj" not in explicit:
        updates["batch_adj"] = 16  # reference config.py:252-254
    return args.replace(**updates)


def apply_setting_config(args: Args, explicit: set[str]) -> Args:
    """Representative rates + forced setting + metric + eval schedule
    (reference ``config.py:209-236``)."""
    updates: dict[str, Any] = {}
    if args.reduction_rate == -1.0:
        updates["reduction_rate"] = REPRESENTATIVE_R.get(args.dataset, 0.5)
    if args.dataset in TRANS_DATASETS:
        updates["setting"] = "trans"
    elif args.dataset in IND_DATASETS:
        updates["setting"] = "ind"
    elif args.setting is None:
        updates["setting"] = "trans"
    updates["metric"] = ("f1_macro" if args.dataset in ("yelp", "amazon")
                         else "accuracy")
    if "run_inter_eval" not in explicit:
        updates["run_inter_eval"] = 3
    eval_interval = max(args.epochs // 10, 1)
    updates["eval_interval"] = eval_interval
    updates["checkpoints"] = tuple(
        range(-1, args.epochs + 1, eval_interval))
    if "eval_epochs" not in explicit:
        updates["eval_epochs"] = 300
    return args.replace(**updates)


def finalize(args: Args, explicit: Optional[set[str]] = None) -> Args:
    """Full precedence chain → immutable run config."""
    explicit = explicit or set()
    args = apply_method_config(args, explicit)
    args = apply_setting_config(args, explicit)
    return args


def get_args(argv: Optional[list[str]] = None) -> Args:
    """CLI entry (argparse re-design of the click command,
    ``config.py:260-399``)."""
    parser = argparse.ArgumentParser("graphslim-tpu")
    defaults = Args()
    short = {"dataset": "-D", "method": "-M", "reduction_rate": "-R",
             "seed": "-S", "epochs": "-E", "hidden": "-H",
             "verbose": "-V", "attack": "-A", "ptb_r": "-P",
             "eval_whole": "-W"}
    for f in dataclasses.fields(Args):
        if f.name in ("metric", "checkpoints", "origin_r"):
            continue
        flag = f"--{f.name}"
        names = [flag] + ([short[f.name]] if f.name in short else [])
        if f.type == "bool" or isinstance(f.default, bool):
            # --flag / --no-flag pairs so True defaults are overridable
            parser.add_argument(*names,
                                action=argparse.BooleanOptionalAction,
                                default=f.default)
        else:
            typ = (type(f.default) if f.default is not None else str)
            parser.add_argument(*names, type=typ, default=f.default)
    ns = parser.parse_args(argv)
    explicit = {
        f.name for f in dataclasses.fields(Args)
        if hasattr(ns, f.name) and getattr(ns, f.name) != f.default
    }
    args = Args(**{f.name: getattr(ns, f.name)
                   for f in dataclasses.fields(Args) if hasattr(ns, f.name)})
    args = finalize(args, explicit)
    _setup_logging(args)
    return args


def _setup_logging(args: Args) -> None:
    """File + console logger under ``{save_path}/logs/{method}/``
    (reference ``config.py:387-394``)."""
    log_dir = os.path.join(args.save_path, "logs", args.method)
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(
        log_dir, f"{args.dataset}_{args.reduction_rate}.log")
    handler = logging.FileHandler(path)
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname)s %(message)s"))
    log.addHandler(handler)
    log.setLevel(logging.DEBUG if args.verbose else logging.INFO)
    if args.verbose and not any(
            isinstance(h, logging.StreamHandler) and not
            isinstance(h, logging.FileHandler) for h in log.handlers):
        log.addHandler(logging.StreamHandler())
