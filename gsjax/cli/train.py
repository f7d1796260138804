"""Training CLI (reference: train.py:193-221)."""

from __future__ import annotations

import os
import sys
import uuid

from gsjax.cli.args import (
    add_group,
    extract,
    make_train_parser,
    save_cfg_args,
)
from gsjax.config import ModelConfig, OptimizationConfig, PipelineConfig
from gsjax.scene import Scene
from gsjax.train.trainer import Trainer
from gsjax.utils.general import safe_state


def prepare_output_and_logger(model_cfg: ModelConfig) -> tuple[ModelConfig, object]:
    """(reference: train.py:134-154)"""
    import dataclasses

    if not model_cfg.model_path:
        unique = os.getenv("OAR_JOB_ID") or str(uuid.uuid4())
        model_cfg = dataclasses.replace(
            model_cfg, model_path=os.path.join("./output/", unique[0:10])
        )
    print(f"Output folder: {model_cfg.model_path}")
    os.makedirs(model_cfg.model_path, exist_ok=True)
    save_cfg_args(model_cfg.model_path, model_cfg)

    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(model_cfg.model_path)
    except ImportError:
        print("Tensorboard not available: not logging progress")
    return model_cfg, tb_writer


def main(argv=None) -> None:
    parser = make_train_parser()
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    model_cfg = extract(ModelConfig, args)
    opt_cfg = extract(OptimizationConfig, args)
    pipe_cfg = extract(PipelineConfig, args)

    save_iterations = list(args.save_iterations) + [opt_cfg.iterations]
    print(f"Optimizing {model_cfg.model_path}")
    safe_state(args.quiet)

    if args.detect_anomaly:
        # The reference maps this to torch.autograd.set_detect_anomaly
        # (reference: train.py:218); the JAX analog traps NaNs at the op
        # that produced them.
        import jax

        jax.config.update("jax_debug_nans", True)

    # --debug is the reference rasterizer's dump-inputs-on-kernel-failure
    # flag (reference: README.md:143-146, arguments/__init__.py:68); the
    # gsjax analog arms the NaN trap from iteration 0 (the trainer already
    # snapshots the full TrainState on a non-finite loss for offline
    # replay). --debug_from delays the same trap (reference train.py:81-82).
    debug_from = 0 if pipe_cfg.debug else args.debug_from

    model_cfg, tb_writer = prepare_output_and_logger(model_cfg)

    gui = None
    try:
        from gsjax.viewer import NetworkGUI

        gui = NetworkGUI(args.ip, args.port)
    except OSError as e:
        print(f"Viewer server unavailable ({e}); continuing without GUI")

    mesh = None
    if args.data_parallel * args.tile_parallel > 1:
        import jax

        from gsjax.parallel.mesh import make_mesh

        n = args.data_parallel * args.tile_parallel
        mesh = make_mesh(
            jax.devices()[:n], data=args.data_parallel, tile=args.tile_parallel
        )
        print(
            f"Training on a (data={args.data_parallel}, "
            f"tile={args.tile_parallel}) device mesh"
        )

    scene = Scene(model_cfg, capacity=args.capacity)
    trainer = Trainer(
        scene,
        model_cfg,
        opt_cfg,
        pipe_cfg,
        start_checkpoint=args.start_checkpoint,
        tb_writer=tb_writer,
        gui=gui,
        quiet=args.quiet,
        profile_dir=args.profile_dir,
        mesh=mesh,
        use_orbax=args.orbax,
    )
    trainer.train(
        test_iterations=set(args.test_iterations),
        save_iterations=set(save_iterations),
        checkpoint_iterations=set(args.checkpoint_iterations),
        debug_from=debug_from,
    )
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
