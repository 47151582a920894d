"""MODE fusion-stage training CLI.

Parity target: ``/root/reference/train_fusion.py`` — silog(λ=0.5) loss on
gt<=maxdepth, Adam at the effective lr ``--lr`` (the reference constructs
Adam at 1e-3 but resets to args.lr every epoch before stepping), per-epoch
checkpoints, 8-metric validation table, TensorBoard with purge_step.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from mode_tpu.cli.common import (count_params, format_table,
                                 load_model_checkpoint, seed_everything)
from mode_tpu.data.deep360 import Deep360DatasetFusion
from mode_tpu.data.file_lists import list_deep360_fusion_train
from mode_tpu.data.loader import DataLoader
from mode_tpu.models.fusion import Baseline, ModeFusion
from mode_tpu.parallel import make_mesh
from mode_tpu import training
from mode_tpu.utils import metrics
from mode_tpu.utils.checkpoint import save_checkpoint
from mode_tpu.utils.tb_writer import SummaryWriter

METRIC_NAMES = ["MAE", "RMSE", "AbsRel", "SqRel", "SILog", "δ1 (%)",
                "δ2 (%)", "δ3 (%)"]


def build_parser():
  p = argparse.ArgumentParser(description="MODE Fusion training (TPU)")
  p.add_argument("--maxdepth", type=float, default=1000.0)
  p.add_argument("--model", default="ModeFusion",
                 choices=["ModeFusion", "Baseline"])
  p.add_argument("--dbname", default="Deep360")
  p.add_argument("--soiled", action="store_true")
  p.add_argument("--resize", action="store_true")
  p.add_argument("--datapath-input", default="./outputs/Deep360PredDepth/")
  p.add_argument("--datapath-dataset", default="./datasets/Deep360/")
  p.add_argument("--epochs", type=int, default=150)
  p.add_argument("--epoch-start", type=int, default=0)
  p.add_argument("--batch-size", type=int, default=4)
  p.add_argument("--lr", type=float, default=0.0001)
  p.add_argument("--loadmodel", default=None)
  p.add_argument("--savemodel", default="./checkpoints/fusion/")
  p.add_argument("--bf16", action="store_true",
                 help="mixed-precision training (bf16 activations, f32 "
                      "master weights)")
  p.add_argument("--packed_dir", default=None,
                 help="pack the train split into one .mfp file per frame "
                      "under this dir (resumable; data/fusion_pack.py) and "
                      "train from the packs with on-device unpack — kills "
                      "the 19-file/frame decode and cuts host->device "
                      "bytes ~3x (ModeFusion only)")
  p.add_argument("--seed", type=int, default=1)
  p.add_argument("--dp", type=int, default=None)
  p.add_argument("--steps_per_epoch", type=int, default=None)
  return p


def unpack(batch):
  depths = [batch["depths"][:, k] for k in range(6)]
  confs = [batch["confs"][:, k] for k in range(6)]
  rgbs = [batch["rgbs"][:, k] for k in range(4)]
  return depths, confs, rgbs, batch["gt"]


def main(argv=None):
  args = build_parser().parse_args(argv)
  seed_everything(args.seed)

  td, tc, tr, tg, vd, vc, vr, vg = list_deep360_fusion_train(
      args.datapath_input, args.datapath_dataset, args.soiled)
  packed = bool(args.packed_dir) and args.model == "ModeFusion" \
      and not args.resize
  if args.packed_dir and not packed:
    print("--packed_dir ignored (requires ModeFusion and no --resize)")
  if packed:
    from mode_tpu.data.fusion_pack import PackedFusionDataset, pack_dataset
    paths = pack_dataset(td, tc, tr, tg,
                         os.path.join(args.packed_dir, "train"),
                         verbose=True)
    train_ds = PackedFusionDataset(paths, gt_names=tg)
  else:
    train_ds = Deep360DatasetFusion(td, tc, tr, tg, resize=args.resize,
                                    training=True)
  val_ds = Deep360DatasetFusion(vd, vc, vr, vg, resize=False, training=False)
  train_loader = DataLoader(train_ds, batch_size=args.batch_size,
                            shuffle=True, num_workers=args.batch_size,
                            seed=args.seed)
  val_loader = DataLoader(val_ds, batch_size=8, num_workers=8)

  if args.model == "ModeFusion":
    model = ModeFusion(max_depth=args.maxdepth)
  else:
    model = Baseline(max_depth=args.maxdepth)

  mesh = make_mesh(data=args.dp, spatial=1)
  optimizer = training.make_optimizer()
  sample = train_ds[0]
  # init always traces with float32 inputs (the raw u8/f16 wire dtypes are
  # unpacked inside the train step, not inside the model)
  mk = lambda a: np.zeros((1,) + a.shape, np.float32)
  d0 = [mk(sample["depths"][k]) for k in range(6)]
  c0 = [mk(sample["confs"][k]) for k in range(6)]
  r0 = [mk(sample["rgbs"][k][..., :3]) for k in range(4)]
  if args.model == "ModeFusion":
    import jax.numpy as jnp
    state = training.init_state(model, optimizer, jax.random.PRNGKey(0),
                                d0, c0, r0, train=False)
    train_step = training.make_fusion_train_step(
        model, optimizer, args.maxdepth, mesh,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        raw_inputs=packed)
    eval_fn = jax.jit(lambda v, d, c, r: model.apply(v, d, c, r,
                                                     train=False))
  else:
    state = training.init_state(model, optimizer, jax.random.PRNGKey(0),
                                d0, train=False)

    def make_step():
      from mode_tpu.utils.losses import silog_loss
      import optax as _optax

      def step(st, depths, confs, rgbs, gt):
        mask = gt <= args.maxdepth

        def loss_fn(params):
          out, mut = model.apply(
              {"params": params, "batch_stats": st.batch_stats},
              list(depths), train=True, mutable=["batch_stats"])
          return silog_loss(0.5, out[..., 0], gt, mask), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params)
        updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
        params = _optax.apply_updates(st.params, updates)
        return st.replace(params=params, batch_stats=stats,
                          opt_state=opt_state, step=st.step + 1), loss
      return jax.jit(step, donate_argnums=(0,))

    train_step = make_step()
    eval_fn = jax.jit(lambda v, d, c, r: model.apply(v, d, train=False))

  if args.loadmodel:
    print("Load pretrained model")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables, _ = load_model_checkpoint(args.loadmodel, variables)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
  print(f"Number of model parameters: {count_params(state.params)}")

  log_path = os.path.join(args.savemodel, args.model, args.dbname, "log")
  os.makedirs(log_path, exist_ok=True)
  writer = SummaryWriter(log_path, purge_step=args.epoch_start)

  state = training.set_learning_rate(state, args.lr)
  t_start = time.time()
  for epoch in range(args.epoch_start, args.epoch_start + args.epochs):
    print(f"This is {epoch}-th epoch")
    train_loader.set_epoch(epoch)
    total_loss, nb = 0.0, 0
    for i, batch in enumerate(train_loader):
      if args.steps_per_epoch and i >= args.steps_per_epoch:
        break
      depths, confs, rgbs, gt = unpack(batch)
      b = training.shard_batch(mesh, (depths, confs, rgbs, gt))
      state, loss = train_step(state, *b)
      total_loss += float(loss)
      nb += 1
    writer.add_scalar("Training Loss", total_loss / max(nb, 1), epoch)

    save_checkpoint(os.path.join(args.savemodel, args.model, args.dbname,
                                 f"ckpt_fusion_epoch{epoch}"),
                    {"epoch": epoch, "params": state.params,
                     "batch_stats": state.batch_stats})

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    totals = np.zeros(8)
    nb = 0
    for i, batch in enumerate(val_loader):
      if args.steps_per_epoch and i >= args.steps_per_epoch:
        break
      depths, confs, rgbs, gt = unpack(batch)
      out = np.asarray(eval_fn(variables, depths, confs, rgbs))[..., 0]
      mask = gt <= args.maxdepth
      m = metrics.depth_metrics(out, gt, mask)
      totals += np.array([float(m[k]) for k in METRIC_NAMES])
      nb += 1
    mean = totals / max(nb, 1)
    print()
    print(format_table(METRIC_NAMES, [list(mean)]))
    for name, val in zip(METRIC_NAMES[:6], mean[:6]):
      writer.add_scalar(name.split(" ")[0], val, epoch)
  print(f"full training time = {(time.time() - t_start) / 3600:.2f} HR")
  writer.close()


if __name__ == "__main__":
  main()
