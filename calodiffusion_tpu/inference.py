"""``calodif-inference`` CLI (reference: calodiffusion/inference.py).

``calodif-inference sample {diffusion|layer}`` generates showers with any
registered sampler and writes reference-compatible HDF5 (gzip ``showers`` +
``incident_energies``/``gen_info``); ``calodif-inference plot`` runs the
histogram/separation-power evaluation suite.
"""

from __future__ import annotations

import os
from datetime import datetime

import click
import h5py
import numpy as np

import jax

from calodiffusion_tpu.utils.config import LoadJson, dotdict


@click.group()
@click.option("-c", "--config")
@click.option("-d", "--data-folder", default="./data/",
              help="Folder containing data and MC files")
@click.option("--checkpoint-folder", default="./trained_models/",
              help="Folder to save checkpoints")
@click.option("-n", "--n-events", default=-1, type=int,
              help="Number of events to load")
@click.option("--job-idx", default=-1, type=int,
              help="Split generation among different jobs")
@click.option("--layer-only/--no-layer", default=False,
              help="Only sample layer energies")
@click.option("--reclean/--no-reclean", default=False,
              help="Redo preprocessing on loaded sample")
@click.option("--debug/--no-debug", default=False, help="Debugging options")
@click.option("--hgcal/--no-hgcal", default=None, is_flag=True,
              help="Use HGCal settings (overwrites config)")
@click.option("--seed", default=None, help="Set a manual seed (saved in config)")
@click.pass_context
def inference(ctx, debug, config, data_folder, checkpoint_folder, layer_only,
              job_idx, n_events, reclean, hgcal, seed):
    from calodiffusion_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()
    ctx.ensure_object(dotdict)
    ctx.obj.config = LoadJson(config) if config is not None else {}
    ctx.obj.checkpoint_folder = checkpoint_folder
    ctx.obj.data_folder = data_folder
    ctx.obj.debug = debug
    ctx.obj.job_idx = job_idx
    ctx.obj.nevts = n_events
    ctx.obj.layer_only = layer_only
    ctx.obj.reclean = reclean

    # quirk preserved: the seed defaults to a random draw stored into the
    # config (reference inference.py:48-52)
    if seed is None:
        seed = int(np.random.default_rng().integers(low=100, high=10**5))
    ctx.obj.seed = int(seed)
    ctx.obj.config["SEED"] = int(seed)
    if hgcal is not None:
        ctx.obj.config["HGCAL"] = hgcal
        ctx.obj.hgcal = hgcal
    else:
        ctx.obj.hgcal = ctx.obj.config.get("HGCAL", False)


@inference.group()
@click.option("-g", "--generated", default="",
              help="Path for generated shower results")
@click.option("--sample-file", default="",
              help="File of showers to generate (override config)")
@click.option("--sample-steps", default=200, type=int,
              help="How many steps for sampling (override config)")
@click.option("--sample-offset", default=0, type=int,
              help="Skip some iterations in the sampling")
@click.option("--sample-algo", default="DDim",
              help="Algorithm for sampling the model output")
@click.option("--sparse-decoding", default=False, is_flag=True,
              help="Sampling during HGCal decoding step to reduce sparsity")
@click.option("--sparse-per-batch", default=False, is_flag=True,
              help="Sparsity sampling once per batch instead of per sample")
@click.option("--batch-size", default=-1, type=int,
              help="Set sampling batch size")
@click.option("--train-sampler/--no-train-sampler", default=None,
              help="For samplers requiring pre-training, train them")
@click.option("--model-loc", default=None,
              help="Specific folder for loading existing model")
@click.option("--int8/--no-int8", default=None,
              help="W8A8 int8 sampling on TPU (config QUANT_INT8; "
                   "TPU-native extension, see ops/quant.py)")
@click.pass_context
def sample(ctx, generated, sample_file, sample_steps, sample_algo,
           sample_offset, sparse_decoding, sparse_per_batch, batch_size,
           train_sampler, model_loc, int8):
    ctx.obj.config["SAMPLER"] = sample_algo
    if int8 is not None:
        ctx.obj.config["QUANT_INT8"] = int8
    if "SAMPLER_OPTIONS" not in ctx.obj.config:
        ctx.obj.config["SAMPLER_OPTIONS"] = {}
    if train_sampler is not None:
        ctx.obj.config["SAMPLER_OPTIONS"]["TRAIN_SAMPLER"] = train_sampler
    if len(sample_file) > 0:
        ctx.obj.config["EVAL"] = sample_file
    if model_loc is None:
        raise ValueError("model-loc is required")

    ctx.obj.model_loc = model_loc
    ctx.obj.sample_steps = sample_steps
    ctx.obj.sample_algo = sample_algo
    ctx.obj.sample_offset = sample_offset
    ctx.obj.sparse_decoding = sparse_decoding
    ctx.obj.sparse_per_batch = sparse_per_batch
    ctx.obj.generated = generated
    ctx.obj.batch_size = batch_size

    non_config = dotdict({k: v for k, v in ctx.obj.items() if k != "config"})
    ctx.obj.config["flags"] = non_config


@sample.command()
@click.option("--layer-model", required=True)
@click.pass_context
def layer(ctx, layer_model):
    from calodiffusion_tpu.train.train_layer_model import TrainLayerModel

    ctx.obj.config["layer_model"] = layer_model
    run_inference(
        ctx.obj, ctx.obj.config,
        model=lambda flags, config, load_data: TrainLayerModel(
            flags, config, load_data=load_data, inference=True
        ),
    )


@sample.command()
@click.pass_context
def diffusion(ctx):
    from calodiffusion_tpu.train.trainer import TrainDiffusion

    non_config = dotdict({k: v for k, v in ctx.obj.items() if k != "config"})
    ctx.obj.config["flags"] = non_config
    run_inference(ctx.obj, ctx.obj.config, model=TrainDiffusion)


@inference.command()
@click.option("-g", "--generated", default="",
              help="Path to existing generated results")
@click.option("--plot-label", default="", help="Labels for the plot")
@click.option("--plot-folder", default="./plots", help="Folder to save results")
@click.option("--plot-reshape/--no-plot-reshape", default=False,
              help="Plot the embedded space")
@click.option("-e", "--extension", multiple=True, default=["png"],
              help="Types of files to save under.")
@click.option("--cms/--no-cms", default=False, help="Use the CMS plotting style")
@click.option("--energy-min", default=-1.0, type=float,
              help="Min cell energy threshold")
@click.option("--geant-only", default=False, is_flag=True,
              help="Plots only of geant distribution")
@click.pass_context
def plot(ctx, generated, plot_label, plot_folder, plot_reshape, extension,
         cms, energy_min, geant_only):
    ctx.obj.plot_label = plot_label
    ctx.obj.plot_folder = plot_folder
    ctx.obj.plot_reshape = plot_reshape
    ctx.obj.plot_extensions = extension
    ctx.obj.generated = generated
    ctx.obj.cms = cms
    ctx.obj.EMin = energy_min
    ctx.obj.geant_only = geant_only

    flags = ctx.obj
    data_dict, energies = process_data_dict(flags, config=ctx.obj.config)
    plot_results(flags, ctx.obj.config, data_dict, energies)


def name_translate(generated_file_path: str) -> str:
    try:
        return generated_file_path.split("/")[-2].split("_")[-1]
    except IndexError:
        return "generated"


def process_data_dict(flags, config):
    """Load generated + Geant4 reference samples (reference :137-203)."""
    from calodiffusion_tpu.data.loader import get_files
    from calodiffusion_tpu.utils.geom import GeomConverter
    from calodiffusion_tpu.utils.xml_handler import XMLHandler

    dataset_num = config.get("DATASET_NUM", 2)

    NN_embed = None
    if flags.hgcal:
        from calodiffusion_tpu.utils import hgcal_utils

        NN_embed = hgcal_utils.HGCalConverter(
            bins=config.get("SHAPE_FINAL"), geom_file=config["BIN_FILE"]
        )
        if flags.plot_reshape:
            NN_embed.init()
    elif dataset_num <= 1:
        bins = XMLHandler(config["PART_TYPE"], config["BIN_FILE"])
        NN_embed = GeomConverter(bins)

    generated = energy = None
    if not flags.geant_only:
        for f_sample in get_files(flags.generated):
            gen, en = LoadSamples(f_sample, flags, config, NN_embed=NN_embed)
            if generated is None:
                generated, energy = gen, en
            else:
                generated = np.concatenate((generated, gen), axis=0)
                energy = np.concatenate((energy, en), axis=0)
            if flags.nevts > 0 and generated.shape[0] >= flags.nevts:
                break

    # --job-idx: Geant4 eval files are read at the matching event offset so
    # job i compares its generated slice against the same Geant events
    # (intended reference semantics, inference.py:138 + plot_evolution.py;
    # the generated file of a job already holds only that job's events)
    job_idx = getattr(flags, "job_idx", -1)
    evt_start = 0
    if job_idx is not None and job_idx >= 0:
        if flags.nevts <= 0:
            raise ValueError("--job-idx requires a positive --n-events")
        evt_start = job_idx * flags.nevts

    data, energies = [], []
    eval_files = get_files(config["EVAL"], folder=flags.data_folder)
    for dataset in eval_files:
        if evt_start > 0:
            with h5py.File(dataset, "r") as h5f:
                raw_nevts = h5f["showers"].shape[0]
            if evt_start >= raw_nevts:
                evt_start -= raw_nevts
                continue
        showers, en = LoadSamples(
            dataset, flags, config, NN_embed=NN_embed, evt_start=evt_start
        )
        evt_start = 0
        data.append(showers)
        energies.append(en)
        if sum(d.shape[0] for d in data) >= flags.nevts > 0:
            break
    if not data:
        raise ValueError(
            "No Evaluation Data passed, please change the `EVAL` field of the config"
        )
    energies = np.concatenate(energies)
    data = np.concatenate(data)
    if flags.nevts > 0:
        energies = energies[: flags.nevts]
        data = data[: flags.nevts]
        if generated is not None:
            generated = generated[: flags.nevts]

    data_dict = {"Geant4": data}
    if not flags.geant_only:
        data_dict[name_translate(flags.generated)] = generated
    return data_dict, energies


def LoadSamples(fp, flags, config, NN_embed=None, evt_start=0):
    """Load one generated/reference h5 (reference :257-297).

    ``evt_start`` slices Geant4 eval files for job-array sharding.  NOTE
    the 0.001 default here intentionally differs from the loader's 200.0:
    it matches the reference site-for-site (inference.py:260 vs
    utils.py:871); both generated and Geant files get the same factor so
    histogram comparisons are unaffected (see PARITY.md).
    """
    end = None if flags.nevts < 0 else evt_start + flags.nevts
    shower_scale = config.get("SHOWERSCALE", 0.001)

    if config.get("DATASET_NUM", 2) <= 1:
        flags.plot_reshape = True

    if (not flags.hgcal) or flags.plot_reshape:
        shape_plot = config["SHAPE_FINAL"]
    else:
        shape_plot = config["SHAPE_PAD"]

    with h5py.File(fp, "r") as h5f:
        if flags.hgcal:
            generated = (
                h5f["showers"][evt_start:end, :, : config["MAX_CELLS"]]
                * shower_scale
            )
            energies = h5f["gen_info"][evt_start:end, 0]
        else:
            generated = h5f["showers"][evt_start:end] * shower_scale
            energies = h5f["incident_energies"][evt_start:end] * shower_scale

    energies = np.reshape(energies, (-1, 1))
    if flags.plot_reshape:
        if config.get("DATASET_NUM", 2) <= 1:
            generated = NN_embed.convert(NN_embed.reshape(generated))
        elif flags.hgcal:
            generated = np.asarray(generated, np.float32).reshape(
                config["SHAPE_PAD"]
            )
            generated = np.asarray(NN_embed.enc_numpy(generated))

    if flags.plot_reshape or not flags.hgcal:
        generated = np.reshape(generated, shape_plot)

    if flags.EMin > 0.0:
        from calodiffusion_tpu.evaluation.metrics_utils import (
            apply_mask_conserveE,
        )

        mask = generated < flags.EMin
        generated = apply_mask_conserveE(generated, mask)
    return generated, energies


def write_out(fout, flags, config, generated, energies, first_write=True,
              do_mask=False):
    """Write generated showers as reference-compatible HDF5 (reference :206-254)."""
    shower_embed = config.get("SHOWER_EMBED", "")
    orig_shape = "orig" in shower_embed
    dataset_num = config.get("DATASET_NUM", 2)

    if not orig_shape:
        generated = generated.reshape(config["SHAPE_ORIG"])
    energies = np.reshape(energies, (energies.shape[0], -1))

    hgcal = config.get("HGCAL", False)
    shower_scale = config.get("SHOWERSCALE", 200.0)

    if do_mask and dataset_num > 1:
        mask_file = os.path.join(
            flags.data_folder, config["EVAL"][0].replace(".hdf5", "_mask.hdf5")
        )
        if not os.path.exists(mask_file):
            mask = np.sum(generated, 0) == 0
        else:
            with h5py.File(mask_file, "r") as h5f:
                mask = h5f["mask"][:]
        generated = generated * (np.reshape(mask, (1, -1)) == 0)

    generated = np.reshape(generated, config["SHAPE_ORIG"])
    shape = list(config["SHAPE_ORIG"])
    shape[0] = None
    energy_key = "gen_info" if hgcal else "incident_energies"
    energy_data = energies if hgcal else (1.0 / shower_scale) * energies
    if first_write:
        print(f"Creating {fout}")
        with h5py.File(fout, "w") as h5f:
            h5f.create_dataset(
                "showers", data=(1.0 / shower_scale) * generated,
                compression="gzip", maxshape=shape, chunks=True,
            )
            h5f.create_dataset(
                energy_key, data=energy_data, compression="gzip",
                maxshape=(None, energies.shape[1]), chunks=True,
            )
    else:
        print(f"Appending to {fout}")
        with h5py.File(fout, "a") as h5f:
            _append_h5(h5f, "showers", (1.0 / shower_scale) * generated)
            _append_h5(h5f, energy_key, energy_data)


def _append_h5(f, name, data):
    prev = f[name].shape[0]
    f[name].resize(prev + data.shape[0], axis=0)
    f[name][prev:] = data


def plot_results(flags, config, data_dict, energies):
    from calodiffusion_tpu.evaluation import plots

    plot_routines = {
        "Energy per layer": plots.ELayer(flags, config),
        "Energy": plots.HistEtot(flags, config),
        "2D Energy scatter split": plots.ScatterESplit(flags, config),
        "Energy Ratio split": plots.HistERatio(flags, config),
        "Layer Sparsity": plots.SparsityLayer(flags, config),
    }
    if flags.hgcal and not flags.plot_reshape:
        plot_routines.update({
            "Energy R": plots.RadialEnergyHGCal(flags, config),
            "Energy R Center": plots.RCenterHGCal(flags, config),
            "Energy Phi Center": plots.PhiCenterHGCal(flags, config),
            "Nhits": plots.HistNhits(flags, config),
            "Max voxel": plots.HistMaxELayer(flags, config),
            "VoxelE": plots.HistVoxelE(flags, config),
        })
    elif not flags.layer_only:
        plot_routines.update({
            "Nhits": plots.HistNhits(flags, config),
            "VoxelE": plots.HistVoxelE(flags, config),
            "Shower width": plots.AverageShowerWidth(flags, config),
            "Max voxel": plots.HistMaxELayer(flags, config),
            "Energy per radius": plots.AverageER(flags, config),
            "Energy per phi": plots.AverageEPhi(flags, config),
        })
    if (not config["CYLINDRICAL"]) and (
        config["SHAPE_PAD"][-1] == config["SHAPE_PAD"][-2]
    ):
        plot_routines["2D average shower"] = plots.Plot_Shower_2D(flags, config)

    for plotting_method in plot_routines.values():
        plotting_method(data_dict, energies)


def run_inference(flags, config, model):
    """Sample the EVAL set with a trained model (reference :342-365)."""
    from calodiffusion_tpu.data.loader import load_data

    data_loader, _ = load_data(flags, config, eval=True)
    trainer = model(flags, config, load_data=False)
    trainer.init_model()
    mdl, params = trainer.load_for_inference()

    sample_steps = (
        flags.sample_steps
        if flags.sample_steps is not None
        else config.get("SAMPLE_STEPS", 400)
    )
    if flags.generated == "":
        fout = (
            f"{trainer.checkpoint_folder}/generated_{config['CHECKPOINT_NAME']}_"
            f"{flags.sample_algo}{sample_steps}_{datetime.now().timestamp()}.h5"
        )
    else:
        fout = flags.generated

    key = jax.random.PRNGKey(flags.seed)
    generated, energies = mdl.generate(
        params, key, data_loader, sample_steps,
        debug=flags.debug, sample_offset=flags.sample_offset,
        sparse_decoding=flags.sparse_decoding,
        sparse_per_batch=flags.sparse_per_batch,
    )
    write_out(fout, flags, config, generated, energies, first_write=True)
    return fout


if __name__ == "__main__":
    inference()
