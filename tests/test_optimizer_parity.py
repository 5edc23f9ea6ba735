"""Optimizer-update parity vs torch: AdamW + joint grad clip + step LR.

Pins the last link of the training chain (losses and gradients are already
reference-anchored elsewhere): given identical gradients, ``make_optimizer``'s
update must equal torch AdamW (lr 1e-4, wd 1e-4, betas/eps defaults,
``imvoxelnet_kitti.py:144-149``) + mmcv ``OptimizerHook.clip_grads`` — ONE
``clip_grad_norm_`` over the whole params-with-grad list (:150, norm_type=2)
— + StepLR x0.1 at epochs [8, 11] of 12 (:151-152), with backbone lr_mult 0.1
/ decay_mult 1.0 and frozen (requires_grad=False) params excluded from both
the norm and the update.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch

from imvoxelnet_tpu.parallel import train as train_lib

LR, WD, CLIP = 1e-4, 1e-4, 35.0


def _make_tree(rng):
    """A param tree exercising all three labels.

    frozen: backbone stem conv + every backbone BN; backbone: deep backbone
    conv (lr_mult 0.1); rest: head conv (lr_mult 1.0).
    """
    def p(*shape):
        return rng.randn(*shape).astype(np.float32)

    return {
        'backbone': {
            'conv1': {'kernel': p(3, 3, 4, 8)},                   # frozen
            'layer3_0': {
                'conv1': {'kernel': p(3, 3, 8, 8)},               # backbone
                'bn1': {'scale': p(8), 'bias': p(8)},             # frozen
            },
        },
        'bbox_head': {'conv_cls': {'kernel': p(1, 1, 8, 2),       # rest
                                   'bias': p(2)}},
    }


def _label_tree(params):
    return train_lib.param_labels(params)


def _torch_step(tparams, labels_flat, grads, lr_scale):
    """One mmcv-semantics torch step: joint clip over params-with-grad,
    per-group lr (backbone 0.1x), AdamW decoupled decay at the group lr."""
    with_grad = [t for t, lab in zip(tparams, labels_flat) if lab != 'frozen']
    for t, lab, g in zip(tparams, labels_flat, grads):
        if lab != 'frozen':
            t.grad = torch.from_numpy(np.asarray(g, np.float32)).clone()
    torch.nn.utils.clip_grad_norm_(with_grad, CLIP, norm_type=2)
    return with_grad


class TestOptimizerParity:

    @pytest.mark.parametrize('steps_per_epoch', [2])
    def test_update_sequence_matches_torch(self, steps_per_epoch):
        rng = np.random.RandomState(0)
        params_np = _make_tree(rng)
        params = jax.tree_util.tree_map(jnp.asarray, params_np)
        labels = _label_tree(params)
        leaves, treedef = jax.tree_util.tree_flatten(params_np)
        labels_flat = jax.tree_util.tree_flatten(labels)[0]
        assert sorted(set(labels_flat)) == ['backbone', 'frozen', 'rest']

        tx = train_lib.make_optimizer(LR, WD, 0.1, CLIP,
                                      steps_per_epoch=steps_per_epoch)
        opt_state = tx.init(params)

        # torch replica: two param groups (backbone lr_mult 0.1 / rest),
        # frozen tensors requires_grad=False and never given grads.
        tparams = [torch.from_numpy(l.copy()) for l in leaves]
        for t, lab in zip(tparams, labels_flat):
            t.requires_grad_(lab != 'frozen')
        groups = [
            {'params': [t for t, lab in zip(tparams, labels_flat)
                        if lab == 'backbone'], 'lr': LR * 0.1},
            {'params': [t for t, lab in zip(tparams, labels_flat)
                        if lab == 'rest'], 'lr': LR},
        ]
        topt = torch.optim.AdamW(groups, lr=LR, betas=(0.9, 0.999),
                                 eps=1e-8, weight_decay=WD)
        base_lrs = [g['lr'] for g in topt.param_groups]

        frozen_init = [l.copy() for l, lab in zip(leaves, labels_flat)
                       if lab == 'frozen']

        total_steps = 12 * steps_per_epoch  # crosses both LR boundaries
        grng = np.random.RandomState(1)
        clipped_steps = 0
        for k in range(total_steps):
            # Alternate regimes: (a) joint norm > 35 but EACH group norm < 35
            # (the exact shape the old per-group clipping got wrong), (b) no
            # clipping, (c) one dominant group.  Frozen leaves always get a
            # huge bogus grad — it must not leak into the norm or the update.
            regime = k % 3
            grads_flat = [grng.randn(*l.shape).astype(np.float32)
                          for l in leaves]

            def group_norm(gs, want):
                return np.sqrt(sum(float((g.astype(np.float64) ** 2).sum())
                                   for g, lab in zip(gs, labels_flat)
                                   if lab == want))

            if regime == 0:
                # per-group norms 30 and 20 (each < 35); joint 36.06 > 35
                target = {'backbone': 30.0, 'rest': 20.0}
            elif regime == 1:
                target = {'backbone': 3.0, 'rest': 2.0}    # joint < 35
            else:
                target = {'backbone': 5.0, 'rest': 50.0}   # one group huge
            for want, t in target.items():
                s = float(t / group_norm(grads_flat, want))
                grads_flat = [g * s if lab == want else g
                              for g, lab in zip(grads_flat, labels_flat)]
            grads_flat = [g * 1e6 if lab == 'frozen' else g
                          for g, lab in zip(grads_flat, labels_flat)]

            joint = np.sqrt(group_norm(grads_flat, 'backbone') ** 2
                            + group_norm(grads_flat, 'rest') ** 2)
            clipped_steps += joint > CLIP
            if regime == 0:
                assert all(group_norm(grads_flat, w) < CLIP
                           for w in ('backbone', 'rest')) and joint > CLIP

            grads = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(g) for g in grads_flat])
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            # torch side: mmcv StepLrUpdaterHook sets each group's lr at
            # epoch start: base * 0.1^(boundaries passed)
            epoch = k // steps_per_epoch
            scale = 0.1 ** ((epoch >= 8) + (epoch >= 11))
            for g, base in zip(topt.param_groups, base_lrs):
                g['lr'] = base * scale
            _torch_step(tparams, labels_flat, grads_flat, scale)
            topt.step()
            topt.zero_grad(set_to_none=True)

            ours_flat = jax.tree_util.tree_flatten(params)[0]
            for ours, theirs, lab in zip(ours_flat, tparams, labels_flat):
                np.testing.assert_allclose(
                    np.asarray(ours), theirs.detach().numpy(),
                    rtol=2e-5, atol=1e-8,
                    err_msg=f'step {k} label {lab}')

        assert clipped_steps >= total_steps // 3  # clipping was exercised
        # frozen params never moved
        ours_flat = jax.tree_util.tree_flatten(params)[0]
        fi = iter(frozen_init)
        for ours, lab in zip(ours_flat, labels_flat):
            if lab == 'frozen':
                np.testing.assert_array_equal(np.asarray(ours), next(fi))

    def test_joint_norm_not_per_group(self):
        """Direct regression for the round-3 per-group-clipping bug.

        Adam's first step is scale-invariant, so a single update cannot see
        the clip factor; run TWO steps (step 1 clipped with per-group norms
        straddling the threshold, step 2 unclipped) and assert the shipped
        optimizer diverges measurably from a replica of the old per-group
        construction on the group the old code left unclipped.
        """
        def old_optimizer():
            boundaries = {10 * e: 0.1 for e in (8, 11)}

            def adamw(scale):
                return optax.chain(
                    optax.clip_by_global_norm(CLIP),
                    optax.adamw(
                        optax.piecewise_constant_schedule(LR * scale,
                                                          boundaries),
                        b1=0.9, b2=0.999, eps=1e-8, weight_decay=WD))

            return optax.multi_transform(
                {'rest': adamw(1.0), 'backbone': adamw(0.1),
                 'frozen': optax.set_to_zero()}, train_lib.param_labels)

        rng = np.random.RandomState(0)
        base = _make_tree(rng)
        labels_flat = jax.tree_util.tree_flatten(_label_tree(base))[0]
        leaves, treedef = jax.tree_util.tree_flatten(base)

        grng = np.random.RandomState(7)
        g1 = [grng.randn(*l.shape).astype(np.float32) for l in leaves]
        # backbone-group norm 20 (< 35: old code leaves it UNCLIPPED),
        # rest-group norm 40 (> 35); joint 44.7 > 35: new code clips BOTH
        for want, t in (('backbone', 20.0), ('rest', 40.0), ('frozen', 1e6)):
            n = np.sqrt(sum(float((g.astype(np.float64) ** 2).sum())
                            for g, lab in zip(g1, labels_flat)
                            if lab == want))
            g1 = [g * float(t / n) if lab == want else g
                  for g, lab in zip(g1, labels_flat)]
        g2 = [g * 0.05 for g in g1]  # step 2: no clipping anywhere

        def run(tx):
            params = jax.tree_util.tree_map(jnp.asarray, base)
            state = tx.init(params)
            for gs in (g1, g2):
                grads = jax.tree_util.tree_unflatten(
                    treedef, [jnp.asarray(g) for g in gs])
                updates, state = tx.update(grads, state, params)
                params = optax.apply_updates(params, updates)
            return jax.tree_util.tree_flatten(params)[0], updates

        new_flat, new_upd = run(
            train_lib.make_optimizer(LR, WD, 0.1, CLIP, steps_per_epoch=10))
        old_flat, _ = run(old_optimizer())

        diffs = {lab: 0.0 for lab in set(labels_flat)}
        for a, b, lab in zip(new_flat, old_flat, labels_flat):
            diffs[lab] = max(diffs[lab],
                             float(np.abs(np.asarray(a) - np.asarray(b)).max()))
        # the group the old code failed to clip must differ after step 2
        assert diffs['backbone'] > 1e-7, diffs
        assert diffs['frozen'] == 0.0
        # frozen updates are exactly zero despite the 1e6 bogus grads
        for u, lab in zip(jax.tree_util.tree_flatten(new_upd)[0], labels_flat):
            if lab == 'frozen':
                assert float(np.abs(np.asarray(u)).max()) == 0.0
