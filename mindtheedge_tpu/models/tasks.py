"""Task models: network + loss compositions, as pure functions over pytrees.

TPU-native re-design of the reference model tower (``models/BaseModel.py`` ->
``SfmModel`` -> ``SelfSupModel`` -> ``SemiSup*`` variants and
``EdgeEstimationLIDARModel``).  Instead of a stateful nn.Module hierarchy,
each task is a thin object holding flax module *definitions* plus pure
``train_loss`` / ``infer`` functions suitable for ``jax.jit`` / ``pjit``.

Deliberate divergences from the reference (documented, not replicated):
* The reference depth net returns ``{'inv_depths': [scales_list, skips_list]}``
  at eval (``PackNetSAN01.py:282-293``), forcing ``['inv_depths'][0][0]``
  indexing downstream (``infer_edges.py:331``).  We return a flat
  ``[4 scale tensors]`` list everywhere.
* ``SemiSupEdgeCompletionModel.py:165`` uses ``edge_lidar_loss`` that is
  undefined when the lidar path is absent (latent NameError); we define it 0.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mindtheedge_tpu.models.packnet import PackNetSAN, PackNet01, PackNetSlim01
from mindtheedge_tpu.models.posenet import PoseNet
from mindtheedge_tpu.models.resnet import DepthResNet, PoseResNet, RaySurfaceResNet
from mindtheedge_tpu.losses.supervised import supervised_loss
from mindtheedge_tpu.losses.grad_loss import grad_loss
from mindtheedge_tpu.losses.photometric import multiview_photometric_loss
from mindtheedge_tpu.geometry.pose import pose_vec2mat
from mindtheedge_tpu.utils.image import flip_lr, match_scales
from mindtheedge_tpu.utils.depth import inv2depth, depth2inv

TASK_REGISTRY: Dict[str, Any] = {}


def register_task(name):
    def deco(cls):
        TASK_REGISTRY[name] = cls
        return cls
    return deco


def build_task(config):
    """Instantiate the task named by ``config.model.name`` (dynamic-registry
    equivalent of reference ``utils/load.py:80-108`` + ``model_wrapper.py:630``)."""
    name = config.model.name
    if name not in TASK_REGISTRY:
        raise KeyError(f'Unknown model {name}; known: {sorted(TASK_REGISTRY)}')
    return TASK_REGISTRY[name](config)


DEPTH_NET_REGISTRY = {
    # reference names (networks/depth/*.py) -> flax modules
    'PackNetSAN01': PackNetSAN,
    'PackNetSlimEnc01': PackNetSAN,   # ckpt-name bypass, utils/config.py:457-458
    'PackNet01': PackNet01,
    'PackNetSlim01': PackNetSlim01,
    'DepthResNet': DepthResNet,
    'RaySurfaceResNet': RaySurfaceResNet,
}

POSE_NET_REGISTRY = {
    'PoseNet': PoseNet,
    'PoseResNet': PoseResNet,
}


def build_depth_net(cfg):
    cls = DEPTH_NET_REGISTRY[cfg.name]
    extra = {}
    if cfg.get('channels'):
        extra['channels'] = tuple(cfg.channels)
    if cls is PackNetSAN:
        return cls(version=cfg.version or '1A',
                   dropout=cfg.dropout or None,
                   input_channels=cfg.input_channels,
                   output_channels=cfg.output_channels,
                   remat=cfg.get('remat', False) or False,
                   freeze_encoder=cfg.freeze_encoder,
                   freeze_decoder=cfg.freeze_decoder,
                   freeze_san=cfg.freeze_san, **extra)
    if cls in (PackNet01, PackNetSlim01):
        return cls(version=cfg.version or '1A', dropout=cfg.dropout or None,
                   **extra)
    if cls in (DepthResNet, RaySurfaceResNet):
        return cls(version=cfg.version or '18')
    return cls()


def build_pose_net(cfg):
    cls = POSE_NET_REGISTRY[cfg.name]
    if cls is PoseResNet:
        return cls(version=cfg.version or '18')
    return cls()


def _maybe_flip(x, flip):
    return jnp.where(flip, flip_lr(x), x)


def upsample_output(inv_depths, mode='nearest'):
    """Upsample all scales to the first scale's resolution
    (reference ``model_utils.py:154-182``)."""
    from mindtheedge_tpu.utils.image import interpolate_image
    shape = (inv_depths[0].shape[1], inv_depths[0].shape[2])
    return [interpolate_image(d, shape, mode=mode) for d in inv_depths]


class BaseTask:
    """Shared depth-forward plumbing (flip wrapper, mutable batch stats)."""

    # batch keys forwarded to the depth net (reference _input_keys)
    input_keys = ('rgb', 'input_depth', 'rgb_edge')
    needs_pose = True

    def __init__(self, config):
        self.config = config
        mloss = config.model.loss
        self.flip_lr_prob = mloss.flip_lr_prob
        self.upsample_depth_maps = mloss.upsample_depth_maps
        self.rotation_mode = mloss.rotation_mode
        self.num_scales = mloss.num_scales
        self.supervised_method = mloss.supervised_method
        self.supervised_num_scales = mloss.supervised_num_scales
        self.supervised_loss_weight = mloss.supervised_loss_weight
        self.all_scales_edge = mloss.edges_depth_edge_loss_all_scales
        self.depth_edges_loss_weight = mloss.depth_edges_loss_weight
        self.edge_cfg = config.edges
        self.photometric_kwargs = dict(
            num_scales=mloss.num_scales,
            ssim_loss_weight=mloss.ssim_loss_weight,
            smooth_loss_weight=mloss.smooth_loss_weight,
            C1=mloss.C1, C2=mloss.C2,
            photometric_reduce_op=mloss.photometric_reduce_op,
            clip_loss=mloss.clip_loss,
            padding_mode=mloss.padding_mode,
            automask_loss=mloss.automask_loss)

        self.depth_net = build_depth_net(config.model.depth_net)
        self.pose_net = None
        if self.needs_pose and config.model.pose_net.name:
            self.pose_net = build_pose_net(config.model.pose_net)
        # optional hook on the raw depth-net output, applied before any loss
        # math — the seam where a spatially-sharded step all_gathers the
        # inverse-depth pyramid so every downstream loss runs bit-identically
        # on full tensors (parallel/spatial.make_spatial_train_step)
        self.output_hook = None
        # optional transform on the depth-net kwarg dict — the spatial step
        # uses it to slice space-replicated image inputs (rgb_edge) down to
        # the local H shard while loss consumers keep the full tensor
        self.net_input_transform = None
        # optional transform on the pose-net inputs — the spatial step
        # all_gathers the H-sharded rgb so the (tiny) pose net runs
        # replicated on the full frame (parallel/spatial.py)
        self.pose_input_transform = None

    # -- init ------------------------------------------------------------------
    def init(self, rng, batch):
        r1, r2 = jax.random.split(rng)
        kwargs = {k: batch[k] for k in self.input_keys[1:] if k in batch}
        # Always create the SAN branch params (the reference always builds
        # mconvs, PackNetSAN01.py:199) so checkpoints have a stable structure.
        if 'input_depth' not in kwargs:
            kwargs['input_depth'] = jnp.zeros(
                batch['rgb'].shape[:3] + (1,), batch['rgb'].dtype)
        variables = {'depth': self.depth_net.init(
            r1, batch['rgb'], train=False, **kwargs)}
        if self.pose_net is not None and 'rgb_context' in batch:
            variables['pose'] = self.pose_net.init(
                r2, batch['rgb'], batch['rgb_context'])
        return variables

    # -- depth forward -----------------------------------------------------------
    def _depth_inputs(self, batch):
        kwargs = {k: batch[k] for k in self.input_keys[1:] if k in batch}
        if self.net_input_transform is not None:
            kwargs = self.net_input_transform(kwargs)
        return kwargs

    def run_depth(self, variables, batch, train, rng=None, force_flip=False):
        """Depth net with random lr-flip wrapping (``SfmModel.py:58-96``).

        With ``arch.precision == 'bfloat16'`` the network computes in bf16
        (params + image inputs cast at the boundary; fp32 master params stay
        in the optimizer; outputs cast back to fp32 before any loss math).
        Returns (output_dict, new_batch_stats_or_None).
        """
        import jax.numpy as jnp_
        compute_dtype = None
        if getattr(self.config.arch, 'precision', 'float32') == 'bfloat16':
            compute_dtype = jnp_.bfloat16

        kwargs = self._depth_inputs(batch)
        rgb = batch['rgb']
        if compute_dtype is not None:
            cast = lambda t: t.astype(compute_dtype) \
                if hasattr(t, 'dtype') and t.dtype == jnp_.float32 else t
            rgb = cast(rgb)
            kwargs = {k: cast(v) for k, v in kwargs.items()}
            variables = dict(variables)
            variables['depth'] = jax.tree_util.tree_map(cast, variables['depth'])
        # flip_lr_prob is a static config value: at 0 the flip machinery is
        # elided from the traced program entirely (jnp.where would otherwise
        # evaluate both branches and the p=0 bernoulli+select stays in the
        # HLO — measured as dead weight in tools/probe_b8_ablate.py)
        if train and self.flip_lr_prob > 0:
            flip = jax.random.bernoulli(rng, self.flip_lr_prob)
        elif not train and force_flip:
            flip = jnp.asarray(True)
        else:
            flip = None

        if flip is None:
            rgb_in, kwargs_in = rgb, kwargs
        else:
            rgb_in = _maybe_flip(rgb, flip)
            kwargs_in = {k: _maybe_flip(v, flip) for k, v in kwargs.items()}

        dvars = variables['depth']
        if train:
            rngs = {'dropout': jax.random.fold_in(rng, 1)}
            out, mutated = self.depth_net.apply(
                dvars, rgb_in, train=True, rngs=rngs,
                mutable=['batch_stats'], **kwargs_in)
            new_stats = mutated.get('batch_stats')
        else:
            out = self.depth_net.apply(dvars, rgb_in, train=False, **kwargs_in)
            new_stats = None

        if self.output_hook is not None:
            out = self.output_hook(out)
        # flip outputs back (reference model_utils.flip_output); loss math
        # always runs fp32
        for key in ('inv_depths', 'inv_depths_rgbd'):
            if key in out:
                out[key] = [(d if flip is None else _maybe_flip(d, flip))
                            .astype(jnp.float32) for d in out[key]]
        if 'depth_loss' in out:
            out['depth_loss'] = out['depth_loss'].astype(jnp.float32)
        if train and self.upsample_depth_maps:
            for key in ('inv_depths', 'inv_depths_rgbd'):
                if key in out:
                    out[key] = upsample_output(out[key])
        return out, new_stats

    def run_pose(self, variables, batch):
        """Pose net -> list of [B,4,4] transforms (``SfmModel.py:98-102``)."""
        rgb, ctx = batch['rgb'], batch['rgb_context']
        if self.pose_input_transform is not None:
            rgb, ctx = self.pose_input_transform(rgb, ctx)
        pose_vec = self.pose_net.apply(variables['pose'], rgb, ctx)
        return [pose_vec2mat(pose_vec[:, i], self.rotation_mode)
                for i in range(pose_vec.shape[1])]

    # -- inference --------------------------------------------------------------
    def infer(self, variables, batch, force_flip=False):
        out, _ = self.run_depth(variables, batch, train=False,
                                force_flip=force_flip)
        return out

    # -- loss pieces ---------------------------------------------------------------
    def _self_sup_loss(self, variables, batch, output, progress):
        poses = self.run_pose(variables, batch)
        loss, metrics = multiview_photometric_loss(
            batch['rgb_original'], batch['rgb_context_original'],
            output['inv_depths'], batch['intrinsics'], batch['intrinsics'],
            poses, **self.photometric_kwargs)
        return loss, metrics

    def _supervised(self, inv_depths, gt_depth):
        return supervised_loss(
            inv_depths, depth2inv(gt_depth),
            supervised_method=self.supervised_method,
            num_scales=self.supervised_num_scales)

    def _edge_loss_all_scales(self, depths_or_probs, batch, seg_mask,
                              is_grad, is_sigmoid, sigmoid_thresh=4.0,
                              use_normals=True, convert_to_depth=True):
        """``compute_edge_loss_with_all_scales`` (SemiSupEdgeModel.py:164-198).

        When ``convert_to_depth`` the scale tensors are inverse depths and are
        converted via inv2depth before the gradient.
        """
        def one(scale_idx, edge_key, normal_key):
            x = depths_or_probs[scale_idx]
            if convert_to_depth:
                x = inv2depth(x)
            normals = batch.get(normal_key) if use_normals else None
            loss, _ = grad_loss(
                x, batch[edge_key], gt_mask=seg_mask, is_grad=is_grad,
                is_sigmoid=is_sigmoid, sigmoid_thresh=sigmoid_thresh,
                gt_normals=normals,
                edge_loss_type=self.edge_cfg.edge_loss_type,
                weight=self.edge_cfg.depth_edges_loss_weight,
                pos_to_neg_weight=self.edge_cfg.depth_edge_loss_pos_to_neg_weight)
            return loss

        total = one(0, 'edge', 'normal')
        if self.all_scales_edge:
            for s in range(1, 4):
                total = total + one(s, f'edge_{s}', f'normal_{s}')
            total = total / 4.0
        return total


@register_task('SfmModel')
class SfmTask(BaseTask):
    """Depth(+pose) container, no training loss of its own."""

    def train_loss(self, variables, batch, rng, progress=0.0):
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        zero = jnp.asarray(0.0)
        return zero, ({'loss': zero}, out, new_stats)


@register_task('SelfSupModel')
class SelfSupTask(BaseTask):
    """+ multiview photometric loss (``SelfSupModel.py:64-98``)."""

    def train_loss(self, variables, batch, rng, progress=0.0):
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        loss, metrics = self._self_sup_loss(variables, batch, out, progress)
        metrics = dict(metrics, loss=loss)
        return loss, (metrics, out, new_stats)


@register_task('SemiSupModel')
class SemiSupTask(SelfSupTask):
    """(1-w)*selfsup + w*supervised (``SemiSupModel.py:73-113``)."""

    def __init__(self, config):
        super().__init__(config)
        if self.supervised_loss_weight == 1:
            self.needs_pose = False
            self.pose_net = None

    def train_loss(self, variables, batch, rng, progress=0.0):
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        metrics = {}
        if self.supervised_loss_weight == 1.0:
            loss = jnp.asarray(0.0)
        else:
            loss, metrics = self._self_sup_loss(variables, batch, out, progress)
            loss = (1.0 - self.supervised_loss_weight) * loss
        sup = self._supervised(out['inv_depths'], batch['depth'])
        loss = loss + self.supervised_loss_weight * sup
        metrics = dict(metrics, supervised_loss=sup, loss=loss)
        return loss, (metrics, out, new_stats)


@register_task('SemiSupCompletionModel')
class SemiSupCompletionTask(SemiSupTask):
    """+ depth completion paths (``SemiSupCompletionModel.py:76-124``)."""

    input_keys = ('rgb', 'input_depth', 'rgb_edge', 'intrinsics')

    def __init__(self, config):
        super().__init__(config)
        self.weight_rgbd = 1.0

    def train_loss(self, variables, batch, rng, progress=0.0):
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        metrics = {}
        if self.supervised_loss_weight == 1.0:
            loss = jnp.asarray(0.0)
        else:
            loss, metrics = self._self_sup_loss(variables, batch, out, progress)
            loss = (1.0 - self.supervised_loss_weight) * loss
        sup = self._supervised(out['inv_depths'], batch['depth'])
        loss = loss + self.supervised_loss_weight * sup
        if 'inv_depths_rgbd' in out:
            sup2 = self._supervised(out['inv_depths_rgbd'], batch['depth'])
            loss = loss + self.weight_rgbd * self.supervised_loss_weight * sup2
            metrics['supervised_loss_rgbd'] = sup2
            if 'depth_loss' in out:
                loss = loss + out['depth_loss']
                metrics['depth_loss'] = out['depth_loss']
        metrics = dict(metrics, supervised_loss=sup, loss=loss)
        return loss, (metrics, out, new_stats)


@register_task('SemiSupEdgeModel')
class SemiSupEdgeTask(SemiSupTask):
    """The paper's training model (``SemiSupEdgeModel.py:98-162``):
    loss = (1-w)*selfsup + w*supervised + edge_w * GradLoss(all scales).

    The edge term is gated on ``edges.train_depth_edges``, the same flag the
    reference uses to attach the loss head (``model_wrapper.py:657``).
    Divergence, documented: with the flag off the reference crashes at train
    time (``edge_loss_head`` was never attached); here the term is statically
    elided from the traced program and ``edge_loss`` reports 0.
    """

    input_keys = ('rgb', 'input_depth', 'rgb_edge')

    def train_loss(self, variables, batch, rng, progress=0.0):
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        metrics = {}
        if self.supervised_loss_weight == 1.0:
            loss = jnp.asarray(0.0)
        else:
            loss, metrics = self._self_sup_loss(variables, batch, out, progress)
            loss = (1.0 - self.supervised_loss_weight) * loss

        if self.edge_cfg.train_depth_edges:
            seg_mask = batch.get('rgb_edge')
            edge = self._edge_loss_all_scales(
                out['inv_depths'], batch, seg_mask,
                is_grad=True, is_sigmoid=True, sigmoid_thresh=4.0)
            edge = self.depth_edges_loss_weight * edge
        else:
            edge = jnp.asarray(0.0)

        sup = self._supervised(out['inv_depths'], batch['depth'])
        supervised = self.supervised_loss_weight * sup
        loss = loss + supervised + edge
        metrics = dict(metrics, edge_loss=edge, supervised_loss=supervised,
                       loss=loss)
        return loss, (metrics, out, new_stats)


@register_task('SemiSupEdgeCompletionModel')
class SemiSupEdgeCompletionTask(SemiSupEdgeTask):
    """Edge + completion (``SemiSupEdgeCompletionModel.py:96-180``)."""

    def __init__(self, config):
        super().__init__(config)
        self.weight_rgbd = 1.0

    def train_loss(self, variables, batch, rng, progress=0.0):
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        metrics = {}
        if self.supervised_loss_weight == 1.0:
            loss = jnp.asarray(0.0)
        else:
            loss, metrics = self._self_sup_loss(variables, batch, out, progress)
            loss = (1.0 - self.supervised_loss_weight) * loss

        seg_mask = batch.get('rgb_edge')
        train_edges = self.edge_cfg.train_depth_edges  # see SemiSupEdgeTask
        if train_edges:
            edge = self._edge_loss_all_scales(
                out['inv_depths'], batch, seg_mask,
                is_grad=True, is_sigmoid=True, sigmoid_thresh=4.0)
            edge = self.depth_edges_loss_weight * edge
        else:
            edge = jnp.asarray(0.0)

        sup = self._supervised(out['inv_depths'], batch['depth'])
        supervised = self.supervised_loss_weight * sup / 2.0

        edge_lidar = jnp.asarray(0.0)   # divergence: defined even w/o lidar
        if 'inv_depths_rgbd' in out and train_edges:
            edge_lidar = self._edge_loss_all_scales(
                out['inv_depths_rgbd'], batch, seg_mask,
                is_grad=True, is_sigmoid=True, sigmoid_thresh=4.0)
        if 'inv_depths_rgbd' in out:
            sup2 = self._supervised(out['inv_depths_rgbd'], batch['depth'])
            supervised = supervised + \
                self.weight_rgbd * self.supervised_loss_weight * sup2 / 2.0
            if 'depth_loss' in out:
                loss = loss + out['depth_loss']
                metrics['depth_loss'] = out['depth_loss']

        loss = loss + supervised + (edge + edge_lidar) / 2.0
        metrics = dict(metrics, edge_loss=edge, edge_lidar_loss=edge_lidar,
                       supervised_loss=supervised, loss=loss)
        return loss, (metrics, out, new_stats)


@register_task('EdgeEstimationLIDARModel')
class EdgeEstimationLIDARTask(BaseTask):
    """DEE training model (``EdgeEstimationLIDARModel.py:87-181``).

    Lidar normalized /200, predictions halved into [0,1] edge probability,
    edge BCE with is_grad=False / is_sigmoid=False on RGB and RGBD paths.
    """

    needs_pose = False
    input_keys = ('rgb', 'input_depth')

    def __init__(self, config):
        super().__init__(config)
        self.weight_rgbd = 1.0

    def _prep_batch(self, batch):
        batch = dict(batch)
        if 'input_depth' in batch:
            batch['input_depth'] = batch['input_depth'] / 200.0
        return batch

    def _halve(self, out, train):
        n = 4 if (train and self.all_scales_edge) else 1
        for key in ('inv_depths', 'inv_depths_rgbd'):
            if key in out:
                scales = list(out[key])
                for s in range(min(n, len(scales))):
                    scales[s] = scales[s] / 2.0
                out[key] = scales
        return out

    def infer(self, variables, batch, force_flip=False):
        batch = self._prep_batch(batch)
        out, _ = self.run_depth(variables, batch, train=False,
                                force_flip=force_flip)
        # At eval the annotation pipeline halves every scale it uses
        # (infer_edge_estimation.py:191,242); halve all four.
        for key in ('inv_depths', 'inv_depths_rgbd'):
            if key in out:
                out[key] = [d / 2.0 for d in out[key]]
        return out

    def train_loss(self, variables, batch, rng, progress=0.0):
        batch = self._prep_batch(batch)
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        out = self._halve(out, train=True)

        loss = jnp.asarray(0.0)
        edge_rgb = self._edge_loss_all_scales(
            out['inv_depths'], batch, None, is_grad=False, is_sigmoid=False,
            use_normals=False, convert_to_depth=False)
        metrics = {'edge_loss': edge_rgb}
        edge_lidar = jnp.asarray(0.0)
        if 'inv_depths_rgbd' in out:
            edge_lidar = self._edge_loss_all_scales(
                out['inv_depths_rgbd'], batch, None, is_grad=False,
                is_sigmoid=False, use_normals=False, convert_to_depth=False)
            metrics['edge_lidar_loss'] = edge_lidar
            if 'depth_loss' in out:
                loss = loss + out['depth_loss']
                metrics['depth_loss'] = out['depth_loss']
        loss = loss + (edge_rgb + self.weight_rgbd * edge_lidar) / 2.0
        metrics['loss'] = loss
        return loss, (metrics, out, new_stats)


@register_task('VelSupModel')
class VelSupTask(SelfSupTask):
    """SelfSup + velocity (pose-translation norm) supervision
    (``VelSupModel.py:19-53``, ``losses/velocity_loss.py:30-38``)."""

    def __init__(self, config):
        super().__init__(config)
        self.velocity_loss_weight = config.model.loss.velocity_loss_weight

    def train_loss(self, variables, batch, rng, progress=0.0):
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        loss, metrics = self._self_sup_loss(variables, batch, out, progress)
        poses = self.run_pose(variables, batch)
        vel = jnp.asarray(0.0)
        for pred, gt in zip(poses, batch['pose_context']):
            pred_t = jnp.linalg.norm(pred[:, :3, 3], axis=-1)
            gt_t = jnp.linalg.norm(gt[:, :3, 3], axis=-1)
            vel = vel + jnp.abs(pred_t - gt_t).mean()
        vel = vel / max(len(poses), 1)
        loss = loss + self.velocity_loss_weight * vel
        metrics = dict(metrics, velocity_loss=vel, loss=loss)
        return loss, (metrics, out, new_stats)


@register_task('GenericSfmModel')
class GenericSfmTask(BaseTask):
    """Ray-surface depth+pose container (reference ``models/GenericSfmModel.py``).

    The depth net (RaySurfaceResNet) returns a learned per-pixel ray surface
    alongside inverse depths; inference passes it through.
    """

    def train_loss(self, variables, batch, rng, progress=0.0):
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        zero = jnp.asarray(0.0)
        return zero, ({'loss': zero}, out, new_stats)


@register_task('GenericSelfSupModel')
class GenericSelfSupTask(GenericSfmTask):
    """Ray-surface self-supervision (reference ``models/GenericSelfSupModel.py``
    + ``losses/generic_multiview_photometric_loss.py``): photometric warp via
    soft-argmax ray-surface projection with progress-annealed temperature."""

    def train_loss(self, variables, batch, rng, progress=0.0):
        from mindtheedge_tpu.geometry.camera_generic import view_synthesis_generic
        from mindtheedge_tpu.losses.photometric import ssim as ssim_map, calc_smoothness
        out, new_stats = self.run_depth(variables, batch, train=True, rng=rng)
        poses = self.run_pose(variables, batch)
        ray_surface = out['ray_surface']

        pk = self.photometric_kwargs
        n = pk['num_scales']
        image = batch['rgb_original']
        inv_depths = out['inv_depths']
        images = match_scales(image, inv_depths, n)

        def photo(t_est, img):
            l1 = jnp.abs(t_est - img)
            w = pk['ssim_loss_weight']
            if w > 0:
                s = jnp.clip((1.0 - ssim_map(t_est, img, pk['C1'], pk['C2'])) / 2.0, 0, 1)
                return w * s.mean(-1, keepdims=True) + (1 - w) * l1.mean(-1, keepdims=True)
            return l1

        photometric_losses = [[] for _ in range(n)]
        for ref_image, pose in zip(batch['rgb_context_original'], poses):
            ref_images = match_scales(ref_image, inv_depths, n)
            for i in range(n):
                from mindtheedge_tpu.utils.image import resize_bilinear
                h, w = inv_depths[i].shape[1], inv_depths[i].shape[2]
                rs_i = ray_surface if ray_surface.shape[1] == h else \
                    resize_bilinear(ray_surface, (h, w), align_corners=True)
                depth_i = inv2depth(inv_depths[i])
                warped = view_synthesis_generic(
                    ref_images[i], depth_i, rs_i, rs_i, pose,
                    progress=progress, padding_mode=pk['padding_mode'],
                    patch_radius=min(20, max(2, h // 8)))
                photometric_losses[i].append(photo(warped, images[i]))
                if pk['automask_loss']:
                    photometric_losses[i].append(photo(ref_images[i], images[i]))

        def reduce_fn(losses):
            if pk['photometric_reduce_op'] == 'mean':
                return sum(l.mean() for l in losses) / len(losses)
            return jnp.concatenate(losses, axis=-1).min(axis=-1).mean()

        loss = sum(reduce_fn(photometric_losses[i]) for i in range(n)) / n
        metrics = {'photometric_loss': loss}
        if pk['smooth_loss_weight'] > 0:
            sx, sy = calc_smoothness(inv_depths, images, n)
            smooth = sum((jnp.abs(sx[i]).mean() + jnp.abs(sy[i]).mean()) / 2 ** i
                         for i in range(n)) / n
            smooth = pk['smooth_loss_weight'] * smooth
            loss = loss + smooth
            metrics['smoothness_loss'] = smooth
        metrics['loss'] = loss
        return loss, (metrics, out, new_stats)
