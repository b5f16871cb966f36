"""`fscl_tpu train` — train any registered system (main.py:43-208)."""
from __future__ import annotations

import os


def run(args):
    import jax
    import numpy as np

    from fscl_tpu.core.checkpoint import CheckpointManager
    from fscl_tpu.core.config import (
        AlgorithmConfig, ModelConfig, TrainConfig, model_config_from_yaml,
        read_algorithm_config, read_data_config, train_config_from_yaml,
    )
    from fscl_tpu.data.batch import collate_batch
    from fscl_tpu.data.datasets import (
        ConcatDataset, FSCLDataset, FastSpeech2Dataset,
    )
    from fscl_tpu.data.feature_store import FeatureStore
    from fscl_tpu.frontend import LANG_ID2SYMBOLS
    from fscl_tpu.obs import (
        CheckpointCallback, LossTableLogger, TensorBoardLogger,
    )
    from fscl_tpu.parallel.mesh import make_mesh
    from fscl_tpu.train.trainer import Trainer

    jax.config.update("jax_compilation_cache_dir", "/tmp/fscl_tpu_jax_cache")

    if getattr(args, "distributed", False):
        from fscl_tpu.parallel.multihost import maybe_initialize, process_info
        maybe_initialize()
        pid, pcount = process_info()
        if pcount > 1:
            print(f"[distributed] process {pid}/{pcount}, "
                  f"{len(jax.local_devices())} local / "
                  f"{len(jax.devices())} global devices")

    import dataclasses

    data_configs = [read_data_config(p) for p in args.data_config]
    model_cfg = (model_config_from_yaml(args.model_config)
                 if args.model_config else ModelConfig())
    train_cfg = (train_config_from_yaml(args.train_config)
                 if getattr(args, "train_config", None) else TrainConfig())
    algo_cfg = (read_algorithm_config(args.algorithm_config)
                if getattr(args, "algorithm_config", None)
                else AlgorithmConfig(type=args.system))
    if args.total_step:
        train_cfg = dataclasses.replace(train_cfg, total_step=args.total_step)
    if getattr(args, "steps_per_dispatch", None):
        train_cfg = dataclasses.replace(
            train_cfg, steps_per_dispatch=args.steps_per_dispatch)

    # register pseudo-unit inventories recorded by `make-units`
    # (reference: build_id2symbols adds common_symbols + unit ids,
    # lightning/build.py:24-31)
    from fscl_tpu.frontend import register_unit_symbols
    for dc in data_configs:
        if dc.unit_name and dc.unit_name not in LANG_ID2SYMBOLS:
            attrs = FeatureStore(dc.data_dir).get_ssl_unit_store(
                dc.unit_name).load_attrs()
            assert "n_units" in attrs, (
                f"unit set '{dc.unit_name}' not found in {dc.data_dir}: "
                "run `fscl_tpu make-units` first")
            register_unit_symbols(dc.unit_name, attrs["n_units"])

    id2symbols = tuple(
        (dc.symbol_id, len(LANG_ID2SYMBOLS[dc.symbol_id]))
        for dc in data_configs)

    # datasets
    stores = {dc.name: FeatureStore(dc.data_dir) for dc in data_configs}
    need_ssl = args.system.startswith("fscl")
    # d-vector speaker paths need per-utterance reference mel slices
    # (speaker_encoder.py:115-136); datasets load them, collate pads them
    dvec_slices = (model_cfg.speaker.n_ref_slices
                   if model_cfg.speaker.uses_dvec else None)
    ds_kw = {"spk_refer_wav": True} if dvec_slices else {}
    ds_cls = FSCLDataset if need_ssl else FastSpeech2Dataset
    datasets = []
    for dc in data_configs:
        train_txt = dc.subset_path("train")
        assert train_txt, f"data config {dc.name} has no train subset"
        datasets.append(
            ds_cls(train_txt, stores[dc.name], dc, model_cfg, **ds_kw))
    dataset = ConcatDataset(datasets)

    # system
    from fscl_tpu.systems import get_system
    sys_cls = get_system(args.system)
    if args.system in ("baseline", "baseline-tune"):
        system = sys_cls(model_cfg, train_cfg.optim, id2symbols)
        def batches():
            rng = np.random.default_rng(train_cfg.seed)
            bs = train_cfg.optim.batch_size
            while True:
                idxs = rng.integers(0, len(dataset), bs)
                _, batch = collate_batch(
                    [dataset[int(i)] for i in idxs],
                    dvec_slices=dvec_slices,
                    pitch_feature=model_cfg.variance.pitch_feature,
                    energy_feature=model_cfg.variance.energy_feature)
                yield batch
        example = next(batches())
    elif args.system in ("fscl", "fscl-orig"):
        from fscl_tpu.data.episodic import EpisodicSampler, InfiniteEpisodes
        # episodes carry raw per-language ids; the generated table only
        # needs to cover the largest per-language inventory (static shape)
        n_symbols = max(n for _, n in id2symbols)
        system = sys_cls(model_cfg, train_cfg.optim, n_symbols)
        labels = []
        for d in datasets:
            labels.extend([d.config.lang_id] * len(d))
        shots, queries = algo_cfg.adapt.shots, algo_cfg.adapt.queries
        sampler = EpisodicSampler(labels, shots=shots, queries=queries,
                                  seed=train_cfg.seed)
        stream = InfiniteEpisodes(dataset, sampler, shots, queries)
        batches = lambda: iter(stream)
        example = next(iter(stream))
    else:
        # generic path: factory + registered datamodule
        import fscl_tpu.data.mix_datamodules  # noqa: F401 (register)
        from fscl_tpu.data.datamodules import (
            datamodule_kwargs_for, get_datamodule,
        )
        from fscl_tpu.systems.factory import build_system
        system = build_system(args.system, model_cfg, train_cfg.optim,
                              data_configs, algo_cfg)
        dm = get_datamodule(args.system)(data_configs, model_cfg, train_cfg,
                                         exp_dir=args.exp_dir,
                                         **datamodule_kwargs_for(args.system, algo_cfg))
        dm.setup()
        batches = dm.train_batches
        example = next(batches())

    state = system.init_state(jax.random.PRNGKey(train_cfg.seed), example)

    if getattr(args, "debug", False):
        # reference --debug harness (main.py:45-49, system.py:32-36):
        # print the model structure and cap the run to a couple of steps
        import dataclasses as _dc
        print(f"[debug] system={args.system} "
              f"batch={type(example).__name__}")
        for coll in ("params", "frozen"):
            tree = getattr(state, coll, None)
            if not tree:
                continue
            for top, sub in tree.items():
                n = sum(int(np.prod(np.shape(x)))
                        for x in jax.tree_util.tree_leaves(sub))
                print(f"[debug]   {coll}/{top}: {n:,} params")
        train_cfg = _dc.replace(
            train_cfg, total_step=min(train_cfg.total_step, 2),
            log_step=1, val_step=10**9, synth_step=10**9, save_step=10**9)
        print(f"[debug] total_step capped to {train_cfg.total_step}")

    ckpt_dir = os.path.join(args.exp_dir, "ckpt")
    strip = ("upstream",) if need_ssl else ()
    mgr = CheckpointManager(ckpt_dir, strip_prefixes=strip, max_to_keep=5)
    if args.pretrain_ckpt:
        pre = CheckpointManager(args.pretrain_ckpt)
        state = pre.restore_into(state)
    if args.resume and mgr.all_steps():
        state = mgr.restore_into(state, full=True)

    mesh = None
    up_parallel = getattr(args, "upstream_parallel", "none") or "none"
    n_model = (getattr(args, "n_model", None) or 1) \
        if up_parallel == "none" else max(
            getattr(args, "n_model", None) or 2, 2)
    if (args.n_devices and args.n_devices > 1) or n_model > 1:
        mesh = make_mesh(n_data=args.n_devices, n_model=n_model)
    if up_parallel != "none":
        # pipeline-/sequence-parallel frozen upstream over the model axis
        # (docs/multihost.md "Choosing a parallel mode"); the jitted step
        # is unchanged — extract_ssl dispatches through the hook
        from fscl_tpu.parallel.pipeline import attach_parallel_upstream
        attach_parallel_upstream(system, up_parallel, mesh)
        print(f"[parallel] frozen upstream {up_parallel} over "
              f"{mesh.shape['model']} model-axis devices")

    callbacks = [
        LossTableLogger(os.path.join(args.exp_dir, "log")),
        TensorBoardLogger(os.path.join(args.exp_dir, "tb")),
        CheckpointCallback(mgr),
    ]
    if getattr(args, "use_tracker", False):
        # experiment tracking with a persistent exp_key (the reference's
        # --use_comet + --exp_key resume flow, main.py:91-137)
        from fscl_tpu.obs.tracking import ExperimentTracker
        tracker = ExperimentTracker(
            os.path.join(args.exp_dir, "experiments"),
            name=args.system, exp_key=getattr(args, "exp_key", None),
            params={"system": args.system,
                    "total_step": train_cfg.total_step,
                    "batch_size": train_cfg.optim.batch_size,
                    "lr": train_cfg.optim.lr})
        print(f"[tracker] exp_key={tracker.exp_key} ({tracker.dir})")
        callbacks.append(tracker)

    trainer = Trainer(system, train_cfg, mesh=mesh, callbacks=callbacks)
    state = trainer.fit(state, batches())
    mgr.save(int(state.step), state)
    print(f"[train] done at step {int(state.step)}; ckpts in {ckpt_dir}")
