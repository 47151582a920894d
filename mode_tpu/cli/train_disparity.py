"""MODE disparity-estimation training CLI.

Parity target: ``/root/reference/train_disparity.py`` — same flags, schedule
(Adam 1e-3, ×0.1 after ``--start_decay``), deep-supervision loss, per-epoch
checkpointing, validation EPE/D1 and a colormapped sample. TPU-native: one
jitted SPMD train step over a ('data','spatial') mesh replaces DataParallel.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from mode_tpu.cli.common import (count_params, load_model_checkpoint,
                                 seed_everything)
from mode_tpu.data.deep360 import Deep360DatasetDisparity
from mode_tpu.data.file_lists import list_deep360_disparity_train
from mode_tpu.data.loader import DataLoader
from mode_tpu.models.disparity import ModeDisparity
from mode_tpu.parallel import make_mesh
from mode_tpu import training
from mode_tpu.utils import metrics
from mode_tpu.utils.checkpoint import save_checkpoint
from mode_tpu.utils.colormap import save_colormapped
from mode_tpu.utils.tb_writer import SummaryWriter


def build_parser():
  p = argparse.ArgumentParser(
      description="MODE Disparity estimation training (TPU)")
  p.add_argument("--model_disp", default="ModeDisparity")
  p.add_argument("--dataset", default="Deep360",
                 choices=["Deep360", "3D60"])
  p.add_argument("--dataset_root", default="../../datasets/Deep360/")
  p.add_argument("--filenames_train", default=None,
                 help="3D60: filenames .txt for the training split")
  p.add_argument("--filenames_val", default=None,
                 help="3D60: filenames .txt for the validation split")
  p.add_argument("--pair", default="all", choices=["lr", "ud", "ur", "all"],
                 help="3D60: stereo pair selection")
  p.add_argument("--max_depth_3d60", type=float, default=20.0)
  p.add_argument("--width", default=512, type=int)
  p.add_argument("--height", default=1024, type=int)
  p.add_argument("--max_disp", type=int, default=192)
  p.add_argument("--max_depth", default=1000, type=float)
  p.add_argument("--epochs", type=int, default=55)
  p.add_argument("--start_decay", type=int, default=45)
  p.add_argument("--batch_size", type=int, default=4)
  p.add_argument("--learning_rate", type=float, default=0.001)
  p.add_argument("--resume", action="store_true")
  p.add_argument("--checkpoint_disp", default=None)
  p.add_argument("--loadSHGonly", action="store_true")
  p.add_argument("--soiled", action="store_true")
  p.add_argument("--crop_disp", action="store_true")
  p.add_argument("--init_type", default="default",
                 choices=["default", "kaiming_normal", "xavier_normal",
                          "kaiming_uniform", "xavier_uniform", "normal"],
                 help="weight re-initialization menu (initModel.py:9-32)")
  p.add_argument("--trace_dir", default=None,
                 help="capture a jax profiler trace of the first epoch")
  p.add_argument("--bf16", action="store_true",
                 help="mixed-precision training (bf16 activations, f32 "
                      "master weights and loss)")
  p.add_argument("--device_normalize", action="store_true",
                 help="stream raw uint8 RGB to the device (4x less "
                      "host->device traffic) and fuse the ImageNet "
                      "normalize into the train step")
  p.add_argument("--seed", type=int, default=123)
  p.add_argument("--save_checkpoint_path", default="./checkpoints/disp/")
  # TPU parallelism (replaces the reference's --parallel DataParallel flag)
  p.add_argument("--dp", type=int, default=None,
                 help="data-parallel mesh size (default: all devices)")
  p.add_argument("--sp", type=int, default=1,
                 help="spatial-parallel mesh size (cost-volume H sharding)")
  p.add_argument("--steps_per_epoch", type=int, default=None,
                 help="debug: truncate epochs to N steps")
  return p


def main(argv=None):
  args = build_parser().parse_args(argv)
  seed_everything(args.seed)

  save_root = os.path.join(args.save_checkpoint_path, args.model_disp,
                           args.dataset)
  image_path = os.path.join(save_root, "outputs")
  os.makedirs(os.path.join(save_root, "logs"), exist_ok=True)
  os.makedirs(image_path, exist_ok=True)
  writer = SummaryWriter(os.path.join(save_root, "logs"))

  print(f"Preparing data. Dataset: <{args.dataset}>")
  if args.dataset == "Deep360":
    tl, tr, td, vl, vr, vd = list_deep360_disparity_train(
        args.dataset_root, soiled=args.soiled)
    train_ds = Deep360DatasetDisparity(tl, tr, td,
                                       shape=(args.height, args.width),
                                       crop=args.crop_disp,
                                       device_normalize=args.device_normalize)
    val_ds = Deep360DatasetDisparity(vl, vr, vd,
                                     shape=(args.height, args.width))
  else:  # 3D60 (512x256 Cassini, sine-law gt disparity from depth)
    from mode_tpu.data.three_d60 import Dataset3D60Disparity
    train_ds = Dataset3D60Disparity(
        args.filenames_train, args.dataset_root, "training",
        shape=(args.height, args.width), crop=args.crop_disp,
        pair=args.pair, max_depth=args.max_depth_3d60)
    val_ds = Dataset3D60Disparity(
        args.filenames_val, args.dataset_root, "validation",
        shape=(args.height, args.width), pair="lr",
        max_depth=args.max_depth_3d60)
  print(f"Num of training data:{len(train_ds)}. "
        f"Num of validation data:{len(val_ds)}")
  train_loader = DataLoader(train_ds, batch_size=args.batch_size,
                            num_workers=4, shuffle=True, seed=args.seed)
  val_loader = DataLoader(val_ds, batch_size=args.batch_size, num_workers=4)

  mesh = make_mesh(data=args.dp, spatial=args.sp)
  print(f"mesh: {mesh.devices.shape} {mesh.axis_names}")

  model = ModeDisparity(maxdisp=args.max_disp, conv="Sphere",
                        sphere_type="Cassini", out_conf=False)
  optimizer = training.make_optimizer()
  rng = jax.random.PRNGKey(args.seed)
  dummy = np.zeros((1, args.height, args.width, 3), np.float32)
  state = training.init_state(model, optimizer, rng, dummy, dummy,
                              train=False)
  if args.init_type != "default":
    from mode_tpu.models.initialize import init_model_params
    variables = init_model_params(
        {"params": state.params}, args.init_type,
        jax.random.PRNGKey(args.seed + 1))
    state = state.replace(params=variables["params"])
    print(f"initialize model <{args.model_disp}> as type <{args.init_type}>")
  print(f"Number of model parameters: {count_params(state.params)}")

  start_epoch = 0
  if args.checkpoint_disp and args.checkpoint_disp != "None":
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables, ckpt_epoch = load_model_checkpoint(
        args.checkpoint_disp, variables, shg_only=args.loadSHGonly)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    if args.resume:
      start_epoch = ckpt_epoch
    print(f"loaded checkpoint <{args.checkpoint_disp}> "
          f"(SHG-only={args.loadSHGonly}, resume from epoch {start_epoch})")

  import jax.numpy as jnp
  train_step = training.make_disparity_train_step(
      model, optimizer, mesh,
      compute_dtype=jnp.bfloat16 if args.bf16 else None)
  eval_fn = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))

  global_step = 0
  for epoch in range(start_epoch + 1, args.epochs + 1):
    t0 = time.time()
    lr = args.learning_rate * (0.1 if epoch > args.start_decay else 1.0)
    state = training.set_learning_rate(state, lr)
    print(f"Epoch: {epoch}, Current Stage: Disp, "
          f"Current Learning Rate: {lr}")
    train_loader.set_epoch(epoch)

    from mode_tpu.utils.profiling import trace
    total_loss, n_batches = 0.0, 0
    maybe_trace = trace(args.trace_dir if epoch == start_epoch + 1 else None)
    with maybe_trace:
      for i, batch in enumerate(train_loader):
        if args.steps_per_epoch and i >= args.steps_per_epoch:
          break
        b = training.shard_batch(mesh, {
            "left": batch["leftImg"], "right": batch["rightImg"],
            "disp": batch["dispMap"]})
        state, loss = train_step(state, b["left"], b["right"], b["disp"])
        loss = float(loss)
        total_loss += loss
        n_batches += 1
        global_step += 1
        writer.add_scalar("loss disp", loss, global_step)
    avg_loss = total_loss / max(n_batches, 1)
    writer.add_scalar("total disp train loss", avg_loss, epoch)
    print(f"epoch: {epoch}, avg train loss: {avg_loss}")

    save_checkpoint(
        os.path.join(save_root,
                     f"ckpt_disp_{args.model_disp}_{args.dataset}_{epoch}"),
        {"epoch": epoch, "params": state.params,
         "batch_stats": state.batch_stats, "train_loss": avg_loss})

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    total_epe, total_d1, counter = 0.0, 0.0, 0
    for i, batch in enumerate(val_loader):
      if args.steps_per_epoch and i >= args.steps_per_epoch:
        break
      gt = batch["dispMap"]
      mask = (gt > 0) & np.isfinite(gt) & (gt <= args.max_disp)
      pred = eval_fn(variables, batch["leftImg"], batch["rightImg"])
      pred = np.asarray(pred)
      epe = float(metrics.mae(pred, np.nan_to_num(gt), mask))
      d1 = float(metrics.d1(3, 0.05, pred, np.nan_to_num(gt), mask))
      if i == 0:
        save_colormapped(os.path.join(image_path, f"{epoch:03d}_val.png"),
                         np.concatenate([np.nan_to_num(gt)[0], pred[0]], 1),
                         np.concatenate([mask[0], mask[0]], 1))
      total_epe += epe
      total_d1 += d1
      counter += gt.shape[0]
    writer.add_scalar("total disp validation loss",
                      total_epe / max(counter, 1), epoch)
    writer.add_scalar("total disp validation d1",
                      total_d1 / max(counter, 1), epoch)
    print(f"epoch: {epoch}, avg val loss: {total_epe / max(counter, 1)}, "
          f"avg val d1 {total_d1 / max(counter, 1)}")
    print(f"Time of This epoch: {time.time() - t0} seconds")
  writer.close()


if __name__ == "__main__":
  main()
