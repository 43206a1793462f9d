"""Experiment driver CLI — flag-compatible with the reference
train_driving_dg.py:29-51 (`--model FRCNN|FCOS`, `--exp dg|non_dg`,
`--source_domains`, `--target_domains`, `--weights_folder`,
`--weights_file`, `--reg_weights a b c d e`).

Domain letters map to datasets exactly like datasetsFromArguments
(train_driving_dg.py:54-107): a=ACDC, b=BDD10k, c=Cityscapes, i=IDD, with
sequential domain indices in that order. Everything is seeded to 42
(train_driving_dg.py:112-116).
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np

from .data.dataset import ConcatDataset, DrivingDataset
from .data.loader import EvalLoader, ProcessTrainLoader, TrainLoader
from .train.harness import Trainer

DOMAIN_SPECS = {
    "a": ("acdc", "data/Annots/acdc_{split}_all.csv", "data/ACDC/rgb_anon/"),
    "b": ("bdd10k", "data/Annots/bdd10k_{split}_all.csv",
          "data/BDD100K/images/10k/{split}/"),
    "c": ("cityscapes", "data/Annots/cityscapes_{split}_all.csv",
          "data/Cityscapes/leftImg8bit/{split}/"),
    "i": ("idd", "data/Annots/idd_{split}_all.csv", "data/IDD/leftImg8bit/{split}/"),
}


def parser_args(argv=None):
    parser = argparse.ArgumentParser(description="Main Experiments (TPU)")
    parser.add_argument("--model", dest="model", default="FRCNN", type=str,
                        help="FRCNN or FCOS")
    parser.add_argument("--exp", dest="exp", default="non_dg", type=str,
                        help="non_dg or dg")
    parser.add_argument("--source_domains", dest="source_domains", default="ABC",
                        type=str)
    parser.add_argument("--target_domains", dest="target_domains", default="I",
                        type=str)
    parser.add_argument("--weights_folder", dest="weights_folder", default="ABC2I",
                        type=str)
    parser.add_argument("--weights_file", dest="weights_file",
                        default="single_source_acdc", type=str)
    parser.add_argument("--reg_weights", nargs=5, metavar=("a", "b", "c", "d", "e"),
                        dest="reg_weights", type=float,
                        default=[0.5, 0.5, 0.5, 0.05, 0.0001])
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--eval_batch_size", type=int, default=1,
                        help="reference parity is 1; raise for TPU throughput")
    parser.add_argument("--max_epochs", type=int, default=100)
    parser.add_argument("--data_root", type=str, default=".")
    parser.add_argument("--metrics_path", type=str, default=None,
                        help="JSONL metrics log (train/val)")
    parser.add_argument("--tb_dir", type=str, default=None,
                        help="TensorBoard log dir (the reference's PL "
                             "default logger, train_driving_dg.py:163); "
                             "scalars mirror the JSONL metrics")
    parser.add_argument("--torch_weights", type=str, default=None,
                        help="torchvision .pth checkpoint to port as the "
                             "pretrained init (COCO detector or ImageNet "
                             "resnet50) — the reference's pretrained=True")
    parser.add_argument("--warmup_steps", type=int, default=0,
                        help="linear LR warmup; use ~500-1000 when training "
                             "from scratch (the reference warm-starts COCO "
                             "weights so its raw lr needs no warmup)")
    parser.add_argument("--decode_cache_gb", type=float, default=0.0,
                        help="per-train-domain decoded-image RAM cache "
                             "budget (GiB); epochs >= 2 skip PNG decode — "
                             "the dominant host cost on low-core hosts "
                             "(scripts/bench_e2e.py numbers)")
    parser.add_argument("--reference_quirks", action="store_true",
                        help="make the run reference-EXACT for parity "
                             "studies: FCOS trains the <=1-GT-image "
                             "zero-target branch (reference fcos.py:139-144)"
                             " and the matcher's exact area formula "
                             "(fcos.py:543), and the DG duplicate batch "
                             "re-samples its augmentation instead of "
                             "replaying identical pixels (DGcommon.py:139-"
                             "151), which also disables the fused pair-step "
                             "optimisation. Defaults reproduce the intent "
                             "with the quirks fixed (docs/MIGRATION.md)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="multi-device SPMD training: 'auto' (all "
                             "devices, data-parallel), 'data=N', or "
                             "'data=N,model=M' (tensor parallelism on the "
                             "head kernels, parallel/mesh.py TP_PATTERNS). "
                             "On multi-host clusters jax.distributed is "
                             "initialised automatically and each host "
                             "loads only its data shard. The reference is "
                             "single-GPU (train_driving_dg.py:163)")
    parser.add_argument("--process_loader", action="store_true",
                        help="run the train loader in a child process "
                             "(shared-memory ring): required for full "
                             "throughput when the device client is an "
                             "in-process RPC proxy, whose socket threads "
                             "otherwise GIL-convoy with loader threads "
                             "(data/loader.py::ProcessTrainLoader)")
    return parser.parse_args(argv)


def datasets_from_arguments(source_domains: str, target_domains: str,
                            data_root: str = ".", decode_cache_gb: float = 0.0):
    def build(letters: str, split: str, cache_gb: float = 0.0):
        out, domain_index = [], -1
        for letter in "abci":
            if letter not in letters:
                continue
            domain_index += 1
            _, csv_tpl, root_tpl = DOMAIN_SPECS[letter]
            csv = os.path.join(data_root, csv_tpl.format(split=split))
            root = os.path.join(data_root, root_tpl.format(split=split))
            out.append(DrivingDataset(
                csv, root, domain_index,
                decode_cache_bytes=int(cache_gb * (1 << 30))))
        return out

    tr_datasets = build(source_domains, "train", decode_cache_gb)
    # val sweeps run EVERY epoch over the same images (DGcommon.py:154-166)
    # — the decode cache pays off there just as much as in training
    vl_datasets = build(source_domains, "val", decode_cache_gb)
    test_datasets = build(target_domains, "val", decode_cache_gb)
    return (
        ConcatDataset(tr_datasets), tr_datasets,
        ConcatDataset(vl_datasets), ConcatDataset(test_datasets),
    )


def main(argv=None):
    args = parser_args(argv)
    SEED = 42
    np.random.seed(SEED)
    random.seed(SEED)

    mesh = None
    if args.mesh:
        from .parallel import mesh as mesh_lib, multihost

        # must run before ANY backend query (multihost.initialize docstring)
        multihost.initialize()
        mesh = mesh_lib.parse_mesh_spec(args.mesh)

    source = args.source_domains.lower()
    target = args.target_domains.lower()
    tr_dataset, tr_datasets, vl_dataset, test_dataset = datasets_from_arguments(
        source, target, args.data_root, args.decode_cache_gb
    )
    num_domains = len(tr_datasets)

    # multi-host input sharding: each process loads only its slice. Train
    # shards must be equal-sized (unequal per-host batch counts deadlock
    # the SPMD step) -> even split; eval keeps every image (ceil split) and
    # equalises program counts with dummy padded batches below.
    pad_batches = {}
    if mesh is not None:
        import jax

        from .data.dataset import Subset
        from .parallel.multihost import host_shard_range

        if jax.process_count() > 1:
            tr_dataset = Subset(
                tr_dataset, *host_shard_range(len(tr_dataset), even=True))
            for key, ds in (("val", vl_dataset), ("test", test_dataset)):
                per = -(-len(ds) // jax.process_count())  # ceil
                bs = args.eval_batch_size
                pad_batches[key] = -(-per // bs)  # max batches any host runs
            vl_dataset = Subset(vl_dataset, *host_shard_range(len(vl_dataset)))
            test_dataset = Subset(
                test_dataset, *host_shard_range(len(test_dataset)))

    # the model canvas must match the data pipeline's padded canvas — bind
    # it to the single source of truth instead of a second default
    from .data import transforms as T

    canvas = T.CANVAS
    if args.model == "FRCNN":
        from .models.dg_frcnn import DGFRCNNModel

        model = DGFRCNNModel(
            num_classes=9, num_domains=num_domains, canvas=canvas)
        val_resize = False  # raw-size val path (train_driving_dg.py:137-138)
    elif args.model == "FCOS":
        from .models.dg_fcos import DGFCOSModel
        from .models.fcos import FCOSLossConfig

        loss_config = FCOSLossConfig(
            exact_reference_area=args.reference_quirks,
            single_gt_quirk=args.reference_quirks,
        )
        model = DGFCOSModel(
            num_classes=9, num_domains=num_domains, canvas=canvas,
            loss_config=loss_config)
        val_resize = True  # Resize(600,1200) val path (train_driving_dg.py:140-142)
    else:
        raise ValueError(args.model)

    dg = args.exp == "dg"
    loader_cls = ProcessTrainLoader if args.process_loader else TrainLoader
    train_loader = loader_cls(tr_dataset, args.batch_size, dg, seed=SEED,
                              resample_replay=args.reference_quirks)
    val_loader = EvalLoader(vl_dataset, args.eval_batch_size, val_resize,
                            pad_to_batches=pad_batches.get("val"))
    test_loader = EvalLoader(test_dataset, args.eval_batch_size, val_resize,
                             pad_to_batches=pad_batches.get("test"))

    ckpt = os.path.join(args.weights_folder, args.weights_file + ".ckpt")
    trainer = Trainer(
        model, train_loader, val_loader,
        reg_weights=args.reg_weights, dg=dg,
        max_epochs=args.max_epochs, ckpt_path=ckpt, seed=SEED,
        metrics_path=args.metrics_path, tb_dir=args.tb_dir,
        warmup_steps=args.warmup_steps,
        torch_weights=args.torch_weights,
        # reference-exact replay re-samples augmentation on the duplicate
        # batch, which the in-program fused replay cannot reproduce
        fused_pairs=not args.reference_quirks,
        mesh=mesh,
    )
    trainer.fit()
    return trainer.test(test_loader)


if __name__ == "__main__":
    main()
