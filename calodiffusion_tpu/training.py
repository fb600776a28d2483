"""``calodif-train`` CLI (reference: calodiffusion/training.py).

Same click group / flags / subcommands so scripts and SLURM templates port
unchanged: ``calodif-train -c config.json [-d DATA] [--checkpoint CKPT]
{diffusion|layer}``.
"""

from __future__ import annotations

import click

from calodiffusion_tpu.utils.config import LoadJson, dotdict


@click.group()
@click.option("-d", "--data-folder", default="../data/",
              help="Folder containing data and MC files")
@click.option("-c", "--config", default="configs/test.json",
              help="Config file with training parameters")
@click.option("--checkpoint", "checkpoint_folder", default="../models",
              help="Folder with checkpoints")
@click.option("-n", "--nevts", type=int, default=-1,
              help="Number of events to load")
@click.option("--frac", type=float, default=0.85,
              help="Fraction of total events used for training")
@click.option("--load", is_flag=True, default=False,
              help="Load pretrained weights to continue the training")
@click.option("--seed", type=int, default=1234, help="PRNG seed")
@click.option("--reclean/--no-reclean", default=False, help="Reclean data")
@click.option("--reset_training", is_flag=True, default=False, help="Retrain")
@click.option("--hgcal/--no-hgcal", default=None, is_flag=True,
              help="Use HGCal settings (overwrites config)")
@click.option("--model-loc", default=None,
              help="Specify existing model to load")
@click.pass_context
def train(ctx, config, data_folder, checkpoint_folder, nevts, frac, load,
          seed, reclean, reset_training, model_loc, hgcal):
    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()
    ctx.ensure_object(dotdict)
    ctx.obj.config = LoadJson(config)
    ctx.obj.data_folder = data_folder
    ctx.obj.checkpoint_folder = checkpoint_folder
    ctx.obj.nevts = nevts
    ctx.obj.frac = frac
    ctx.obj.load = load
    ctx.obj.seed = seed
    ctx.obj.reclean = reclean
    ctx.obj.reset_training = reset_training
    ctx.obj.model_loc = model_loc

    if hgcal is not None:
        ctx.obj.config["HGCAL"] = hgcal
        ctx.obj.hgcal = hgcal
    else:
        ctx.obj.hgcal = ctx.obj.config.get("HGCAL", False)


@train.command()
@click.pass_context
def diffusion(ctx):
    from calodiffusion_tpu.train.trainer import TrainDiffusion

    TrainDiffusion(ctx.obj, ctx.obj.config).train()


@train.command()
@click.option("--teacher-loc", default=None,
              help="Trained diffusion checkpoint to distill from "
                   "(overrides config TEACHER_LOC)")
@click.pass_context
def distill(ctx, teacher_loc):
    """Consistency-distill a trained diffusion model into a 1-5 step
    student for the Consistency sampler (train/train_distill.py)."""
    from calodiffusion_tpu.train.train_distill import TrainDistillation

    if teacher_loc is not None:
        ctx.obj.config["TEACHER_LOC"] = teacher_loc
    TrainDistillation(ctx.obj, ctx.obj.config).train()


@train.command()
@click.option("--layer-model-loc", default=None,
              help="Specify existing layer model to load")
@click.pass_context
def layer(ctx, layer_model_loc):
    from calodiffusion_tpu.train.train_layer_model import TrainLayerModel

    if layer_model_loc is not None and ctx.obj.load:
        ctx.obj.config["layer_model"] = layer_model_loc
    TrainLayerModel(ctx.obj, ctx.obj.config).train()


if __name__ == "__main__":
    train()
