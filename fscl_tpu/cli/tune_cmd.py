"""`fscl_tpu tune` — few-shot transfer to a new language
(main.py --tune path, §3.3: tune_init embedding transplant + supervised
fine-tuning on the few-shot split)."""
from __future__ import annotations

import os


def run(args):
    import jax
    import numpy as np

    from fscl_tpu.core.checkpoint import CheckpointManager
    from fscl_tpu.core.config import (
        ModelConfig, TrainConfig, OptimConfig, model_config_from_yaml,
        read_data_config,
    )
    from fscl_tpu.data.batch import collate_batch
    from fscl_tpu.data.datamodules import FastSpeech2DataModule
    from fscl_tpu.data.datasets import FSCLDataset
    from fscl_tpu.data.episodic import collate_sup_info
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.frontend import LANG_ID2SYMBOLS
    from fscl_tpu.obs import CheckpointCallback, LossTableLogger
    from fscl_tpu.systems.baseline import BaselineSystem
    from fscl_tpu.systems.fscl import TransEmbSystem
    from fscl_tpu.systems.tune import tune_init
    from fscl_tpu.train.trainer import Trainer

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    dc = read_data_config(args.data_config)
    model_cfg = (model_config_from_yaml(args.model_config)
                 if args.model_config else ModelConfig())
    train_cfg = TrainConfig(total_step=args.adaptation_steps)
    id2symbols = ((dc.symbol_id, len(LANG_ID2SYMBOLS[dc.symbol_id])),)
    n_symbols = len(LANG_ID2SYMBOLS[dc.symbol_id])

    # data
    store = FeatureStore(dc.data_dir)
    train_txt = dc.subset_path("train")
    fscl_ds = FSCLDataset(train_txt, store, dc, model_cfg,
                          upstream=model_cfg.upstream.name)
    dm = FastSpeech2DataModule([dc], model_cfg, train_cfg,
                               exp_dir=args.exp_dir)
    dm.setup()

    # systems: pretrained FSCL (frozen meta-learned codebook) + baseline
    baseline = BaselineSystem(model_cfg, train_cfg.optim, id2symbols)
    example = next(dm.train_batches())
    b_state = baseline.init_state(jax.random.PRNGKey(train_cfg.seed), example)

    from fscl_tpu.systems.fscl import Episode
    fscl = TransEmbSystem(model_cfg, train_cfg.optim, n_symbols)
    sup_batches = [collate_sup_info([fscl_ds[i] for i in range(
        start, min(start + 4, len(fscl_ds)))])
        for start in range(0, len(fscl_ds), 4)]
    fscl_state = fscl.init_state(
        jax.random.PRNGKey(0), Episode(sup=sup_batches[0], qry=example))
    if args.fscl_ckpt:
        mgr = CheckpointManager(args.fscl_ckpt)
        fscl_state = mgr.restore_into(fscl_state)

    # embedding transplant (tune_init)
    new_params = tune_init(fscl, fscl_state.params, baseline, b_state.params,
                           sup_batches, dc.symbol_id)
    b_state = b_state.replace(params=new_params)

    # supervised fine-tuning (all params optimized, BaselineTuneSystem)
    ckpt_dir = os.path.join(args.exp_dir, "ckpt")
    mgr = CheckpointManager(ckpt_dir, max_to_keep=3)
    if getattr(args, "scan_adapt", False):
        # whole adaptation as ONE on-chip lax.scan — no per-step host
        # round-trips; per-ft-step loss curve saved like the reference's
        # meta saver CSVs (lightning/callbacks/saver.py:23-321)
        from fscl_tpu.obs.loggers import AdaptationSaver
        from fscl_tpu.systems.tune import (
            adapt_on_chip_chunked, adapt_on_chip_resident,
        )
        # few-shot splits fit on device whole: upload once, gather each
        # step's batch on chip (no 20k-batch host stream). Larger splits
        # fall back to the chunked streaming scan.
        support = (dm.full_train_batch()
                   if hasattr(dm, "full_train_batch") else None)
        if support is not None:
            new_params, losses = adapt_on_chip_resident(
                baseline, b_state.params, b_state.batch_stats, support,
                args.adaptation_steps,
                batch_size=train_cfg.optim.batch_size,
                lr=args.scan_lr, symbol_id=dc.symbol_id,
                optimizer=getattr(args, "scan_optimizer", "sgd"),
                seed=train_cfg.seed)
        else:
            new_params, losses = adapt_on_chip_chunked(
                baseline, b_state.params, b_state.batch_stats,
                dm.train_batches(), args.adaptation_steps,
                lr=args.scan_lr, symbol_id=dc.symbol_id,
                optimizer=getattr(args, "scan_optimizer", "sgd"))
        b_state = b_state.replace(params=new_params)
        saver = AdaptationSaver(os.path.join(args.exp_dir, "csv"))
        path = saver.save_curve(dc.symbol_id, np.asarray(losses))
        print(f"[tune] scan adaptation loss "
              f"{float(np.asarray(losses)[0]):.3f} -> "
              f"{float(np.asarray(losses)[-1]):.3f}; curve at {path}")
    else:
        trainer = Trainer(baseline, train_cfg, callbacks=[
            LossTableLogger(os.path.join(args.exp_dir, "log")),
            CheckpointCallback(mgr)])
        b_state = trainer.fit(b_state, dm.train_batches())
    mgr.save(int(b_state.step), b_state)
    print(f"[tune] adapted to {dc.symbol_id}; ckpts in {ckpt_dir}")
