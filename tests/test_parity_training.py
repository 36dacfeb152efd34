"""Optimization-trajectory parity vs the torch reference (VERDICT r2 next
item 6): both frameworks start from the SAME converted weights, overfit the
SAME batch with the reference's alternating main/policy curriculum steps
(SGD+momentum+wd on the main net, Adam+wd on the policy net, loss = CE [+
blockdrop policy loss in the policy phase], reference utils/utils.py:319-424,
train_adamml.py:250-257), and their loss trajectories and selection rates
must track. Decisions are deterministic straight-through argmax (zero-noise
gumbel_softmax) on BOTH sides, so gradients flow through the ST estimator
identically. This is the strongest accuracy-parity evidence obtainable
without the real dataset.
"""

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.test_parity_full import (_build_reference, _convert_full,
                                    _make_inputs, MODALITY, N, S, F, HW, K)

TAU = 5.0
STEPS = 8           # alternating iterations -> 16 optimizer steps
LR, P_LR, WD = 0.01, 0.01, 1e-4
COST = [1.0, 0.05]  # reference README.md:93 rgb+sound cost weights


def _st_argmax_torch(logits):
    """zero-noise F.gumbel_softmax(hard=True)[:, -1]: deterministic hard
    decision with the straight-through gradient."""
    y = torch.softmax(logits / TAU, dim=-1)
    hard = (logits.argmax(dim=-1) == 1).float()
    return hard + y[..., 1] - y[..., 1].detach()


def _st_argmax_torch_live(pnet):
    """Like _st_argmax_torch but reads the LIVE policy-net temperature so
    decay_temperature() (reference models/adamml.py:111-112, x0.965 per
    alternating epoch pair) changes the straight-through gradient exactly as
    F.gumbel_softmax(tau=self.temperature) would."""
    def fn(logits):
        y = torch.softmax(logits / pnet.temperature, dim=-1)
        hard = (logits.argmax(dim=-1) == 1).float()
        return hard + y[..., 1] - y[..., 1].detach()
    return fn


def _st_argmax_jax(rng, logits, tau):
    y = jax.nn.softmax(logits / tau, axis=-1)
    hard = (jnp.argmax(logits, axis=-1) == 1).astype(jnp.float32)
    return hard + y[..., 1] - jax.lax.stop_gradient(y[..., 1])


def _ref_policy_loss(decisions, cost_weights, gammas, logits, target):
    """Inline twin of reference utils/utils.py:166-184 (blockdrop)."""
    top1 = torch.argmax(logits.detach(), dim=-1)
    correct = (top1 == target).type_as(logits)
    sel = torch.mean(decisions, dim=1)   # (N, M) per-video selection
    sel = sel * sel
    loss = torch.tensor(0.0)
    for w, pl in zip(cost_weights, sel.chunk(chunks=sel.shape[-1], dim=-1)):
        loss = loss + w * torch.mean(correct * pl)
    return loss + torch.mean((torch.ones_like(correct) - correct) * gammas)


def _run_reference(ref, ref_in, target_np):
    ref.policy_net.wrapper_gumbel_softmax = _st_argmax_torch
    target = torch.from_numpy(target_np)
    p_opt = torch.optim.Adam(ref.policy_net.parameters(), P_LR,
                             weight_decay=WD)
    opt = torch.optim.SGD(ref.main_net.parameters(), LR, momentum=0.9,
                          weight_decay=WD, nesterov=False)
    traj = []
    for it in range(STEPS):
        for phase in ("main", "policy"):
            if phase == "main":
                ref.freeze_policy_net()
                ref.unfreeze_main_net()
                cw = [0.0, 0.0]
            else:
                ref.unfreeze_policy_net()
                ref.freeze_main_net()
                cw = COST
            ref.train()
            out, dec = ref(ref_in, S)
            cls = torch.nn.functional.cross_entropy(out, target)
            ploss = _ref_policy_loss(dec, cw, 10.0, out, target)
            loss = cls + ploss if phase == "policy" else cls
            loss.backward()
            if ref.update_policy_net:
                p_opt.step()
                p_opt.zero_grad()
            if ref.update_main_net:
                opt.step()
                opt.zero_grad()
            correct = (out.detach().argmax(dim=-1)
                       == target).float().mean().item()
            traj.append({
                "phase": phase, "cls": float(cls.detach()),
                "policy": float(ploss.detach()), "correct": correct,
                "sel": dec.detach().numpy().mean(axis=(0, 1)),
                "dec": dec.detach().numpy()})
    return traj


def _run_ours(params, stats, ours_in, target_np, monkeypatch):
    from adamml_tpu.models import policy_net as our_pnet
    from adamml_tpu.models.adamml import AdaMML
    from adamml_tpu.train.optim import FusedSGD, adam_transform
    from adamml_tpu.train.steps import make_adamml_train_step
    from adamml_tpu.train.train_state import AdaMMLTrainState, StageFlags

    monkeypatch.setattr(our_pnet, "gumbel_decision", _st_argmax_jax)
    model = AdaMML(modality=tuple(MODALITY), num_classes=K, depth=18,
                   dropout=0.0, fusion_point="logits",
                   learnable_lf_weights=True, causality_modeling="lstm",
                   policy_input_size=160, dtype=jnp.float32)
    tx_main = FusedSGD(momentum=0.9, nesterov=False, weight_decay=WD)
    tx_policy = adam_transform(weight_decay=WD)
    state = AdaMMLTrainState.create(
        params, stats, tx_main.init(params["main_net"]),
        tx_policy.init(params["policy_net"]), temperature=TAU)
    common = dict(penalty_type="blockdrop", gammas=10.0, clip_gradient=None,
                  has_policy_params=True)
    step_main = make_adamml_train_step(model, tx_main, tx_policy,
                                       flags=StageFlags.main_phase(),
                                       **common)
    step_policy = make_adamml_train_step(model, tx_main, tx_policy,
                                         flags=StageFlags.policy_phase(),
                                         **common)
    target = jnp.asarray(target_np)
    lr, p_lr = jnp.asarray(LR), jnp.asarray(P_LR)
    zeros, cost = jnp.zeros((2,)), jnp.asarray(COST)
    rng = jax.random.PRNGKey(0)  # unused: decisions are deterministic
    traj = []
    for it in range(STEPS):
        for phase, fn, cw in (("main", step_main, zeros),
                              ("policy", step_policy, cost)):
            state, m = fn(state, ours_in, target, lr, p_lr, cw, rng)
            traj.append({"phase": phase,
                         "cls": float(m["cls_loss"]),
                         "policy": float(m["policy_loss"]),
                         "correct": float(m["top1"]) / 100.0,
                         "sel": np.asarray(m["selection"])})
    return traj


class TestTrainingCurveParity:
    @pytest.fixture(scope="class")
    def trajectories(self):
        ref = _build_reference()
        # kill dropout on both sides: the only cross-framework rng left
        for mod in ref.modules():
            if isinstance(mod, torch.nn.Dropout):
                mod.p = 0.0
        params, stats = _convert_full(ref)
        rng = np.random.RandomState(7)
        ours_in, ref_in = _make_inputs(rng)
        target_np = rng.randint(0, K, size=(N,)).astype(np.int64)

        ref_traj = _run_reference(ref, ref_in, target_np)

        # class-scoped fixture can't take the function-scoped monkeypatch
        # fixture; use an explicit context so the module-global
        # gumbel_decision patch is UNDONE for later tests (it once leaked and
        # broke the eval-rng regression test)
        with pytest.MonkeyPatch.context() as mp:
            ours_traj = _run_ours(params, stats, ours_in, target_np, mp)
        return ref_traj, ours_traj

    def test_loss_trajectories_track(self, trajectories):
        ref_traj, ours_traj = trajectories
        assert len(ref_traj) == len(ours_traj) == 2 * STEPS
        for t, (r, o) in enumerate(zip(ref_traj, ours_traj)):
            assert r["phase"] == o["phase"]
            # fp drift compounds over steps; the curves must still track
            np.testing.assert_allclose(
                o["cls"], r["cls"], rtol=0.05, atol=0.02,
                err_msg=f"cls loss diverged at step {t} ({r['phase']})")
            # the blockdrop loss's gammas*(1-correct) term is a step
            # function of argmax correctness (constant w.r.t. params,
            # reference utils/utils.py:183): near the decision boundary a
            # ~1e-3 fp drift legitimately flips one sample, jumping the
            # logged loss by gammas/N. Compare the CONTINUOUS cost term
            # tightly and bound the correctness flip to one sample.
            o_cost = o["policy"] - 10.0 * (1.0 - o["correct"])
            r_cost = r["policy"] - 10.0 * (1.0 - r["correct"])
            # the selection-cost term is ALSO gated per-sample on argmax
            # correctness (reference utils/utils.py:179-181), so normalize
            # by the correct fraction when a boundary sample flipped
            o_norm = o_cost / max(o["correct"], 1e-6)
            r_norm = r_cost / max(r["correct"], 1e-6)
            np.testing.assert_allclose(
                o_norm, r_norm, rtol=0.05, atol=0.02,
                err_msg=f"policy cost term diverged at step {t}")
            assert abs(o["correct"] - r["correct"]) <= 1.0 / N + 1e-6, \
                f"top-1 correctness diverged by >1 sample at step {t}"

    def test_first_steps_are_tight(self, trajectories):
        """Before drift accumulates, the losses must agree closely."""
        ref_traj, ours_traj = trajectories
        for r, o in zip(ref_traj[:2], ours_traj[:2]):
            np.testing.assert_allclose(o["cls"], r["cls"], rtol=2e-3,
                                       atol=2e-3)
            np.testing.assert_allclose(o["policy"], r["policy"], rtol=2e-3,
                                       atol=2e-3)

    def test_selection_rates_track(self, trajectories):
        ref_traj, ours_traj = trajectories
        for t, (r, o) in enumerate(zip(ref_traj, ours_traj)):
            np.testing.assert_allclose(
                o["sel"], r["sel"], atol=0.13,
                err_msg=f"selection rates diverged at step {t}")

    def test_losses_actually_moved(self, trajectories):
        """The runs must have really trained (overfit): the main-phase CE
        at the end is well below the start on both sides."""
        ref_traj, ours_traj = trajectories
        for traj in (ref_traj, ours_traj):
            main_cls = [x["cls"] for x in traj if x["phase"] == "main"]
            assert main_cls[-1] < main_cls[0] * 0.9


# ---------------------------------------------------------------------------
# Curriculum-transition parity (VERDICT r3 next item 9): a LONGER overfit that
# crosses a stage boundary -- alternating pairs with x0.965 temperature decay
# after each (reference train_adamml.py:516, models/adamml.py:111-112), then
# the finetune transition: BOTH optimizers re-initialized fresh (momentum /
# Adam moments zeroed, train_adamml.py:519-528), policy frozen, zero cost
# weights (train_adamml.py:552-564). Pins the transition math itself against
# torch, not just steady-state steps.
# ---------------------------------------------------------------------------

# 8 pairs is the empirically stable horizon for deterministic-ST decision
# dynamics at batch 2 (TestTrainingCurveParity): longer runs eventually hit a
# knife-edge argmax flip on one side only, after which the main nets train on
# different modality subsets and the curves are incomparable. The transition
# evidence (decay, optimizer re-init, frozen-policy finetune) is unaffected.
ALT_PAIRS = 8   # alternating (main, policy) pairs before the boundary
FT_STEPS = 10   # finetune (main-only) steps after the optimizer re-init
DECAY = 0.965   # reference models/adamml.py:33


def _torch_phase_step(ref, ref_in, target, opt, p_opt, phase, cw):
    if phase == "main":  # warmup/alternating-main/finetune all run this way
        ref.freeze_policy_net()
        ref.unfreeze_main_net()
    else:
        ref.unfreeze_policy_net()
        ref.freeze_main_net()
    ref.train()
    out, dec = ref(ref_in, S)
    cls = torch.nn.functional.cross_entropy(out, target)
    ploss = _ref_policy_loss(dec, cw, 10.0, out, target)
    # the policy loss enters the total only while the policy trains
    # (reference utils/utils.py:379-382)
    loss = cls + ploss if phase == "policy" else cls
    loss.backward()
    if ref.update_policy_net:
        p_opt.step()
        p_opt.zero_grad()
    if ref.update_main_net:
        opt.step()
        opt.zero_grad()
    correct = (out.detach().argmax(dim=-1) == target).float().mean().item()
    return {"phase": phase, "cls": float(cls.detach()),
            "policy": float(ploss.detach()), "correct": correct,
            "sel": dec.detach().numpy().mean(axis=(0, 1))}


def _run_reference_curriculum(ref, ref_in, target_np):
    ref.policy_net.wrapper_gumbel_softmax = _st_argmax_torch_live(
        ref.policy_net)
    target = torch.from_numpy(target_np)

    def fresh_opts():
        return (torch.optim.SGD(ref.main_net.parameters(), LR, momentum=0.9,
                                weight_decay=WD, nesterov=False),
                torch.optim.Adam(ref.policy_net.parameters(), P_LR,
                                 weight_decay=WD))

    opt, p_opt = fresh_opts()
    traj = []
    for _ in range(ALT_PAIRS):
        traj.append(_torch_phase_step(ref, ref_in, target, opt, p_opt,
                                      "main", [0.0, 0.0]))
        traj.append(_torch_phase_step(ref, ref_in, target, opt, p_opt,
                                      "policy", COST))
        ref.decay_temperature()  # reference train_adamml.py:516
    # stage boundary: fresh optimizer state (reference train_adamml.py:519-528)
    opt, p_opt = fresh_opts()
    for _ in range(FT_STEPS):
        traj.append(_torch_phase_step(ref, ref_in, target, opt, p_opt,
                                      "main", [0.0, 0.0]))
    return traj, float(ref.policy_net.temperature)


def _run_ours_curriculum(params, stats, ours_in, target_np, monkeypatch):
    from adamml_tpu.models import policy_net as our_pnet
    from adamml_tpu.models.adamml import AdaMML
    from adamml_tpu.train.optim import FusedSGD, adam_transform
    from adamml_tpu.train.steps import make_adamml_train_step
    from adamml_tpu.train.train_state import AdaMMLTrainState, StageFlags

    monkeypatch.setattr(our_pnet, "gumbel_decision", _st_argmax_jax)
    model = AdaMML(modality=tuple(MODALITY), num_classes=K, depth=18,
                   dropout=0.0, fusion_point="logits",
                   learnable_lf_weights=True, causality_modeling="lstm",
                   policy_input_size=160, dtype=jnp.float32)
    tx_main = FusedSGD(momentum=0.9, nesterov=False, weight_decay=WD)
    tx_policy = adam_transform(weight_decay=WD)
    state = AdaMMLTrainState.create(
        params, stats, tx_main.init(params["main_net"]),
        tx_policy.init(params["policy_net"]), temperature=TAU)
    common = dict(penalty_type="blockdrop", gammas=10.0, clip_gradient=None,
                  has_policy_params=True)
    step_main = make_adamml_train_step(model, tx_main, tx_policy,
                                       flags=StageFlags.main_phase(),
                                       **common)
    step_policy = make_adamml_train_step(model, tx_main, tx_policy,
                                         flags=StageFlags.policy_phase(),
                                         **common)
    target = jnp.asarray(target_np)
    lr, p_lr = jnp.asarray(LR), jnp.asarray(P_LR)
    zeros, cost = jnp.zeros((2,)), jnp.asarray(COST)
    rng = jax.random.PRNGKey(0)  # unused: decisions are deterministic
    traj = []

    def run(fn, phase, cw):
        nonlocal state
        state, m = fn(state, ours_in, target, lr, p_lr, cw, rng)
        traj.append({"phase": phase, "cls": float(m["cls_loss"]),
                     "policy": float(m["policy_loss"]),
                     "correct": float(m["top1"]) / 100.0,
                     "sel": np.asarray(m["selection"])})

    for _ in range(ALT_PAIRS):
        run(step_main, "main", zeros)
        run(step_policy, "policy", cost)
        state = state.replace(temperature=state.temperature * DECAY)
    # stage boundary: fresh optimizer state, policy frozen, zero cost --
    # exactly what curriculum.py::_reset_optimizers + the finetune stage do
    state = state.replace(
        main_opt=tx_main.init(state.params["main_net"]),
        policy_opt=tx_policy.init(state.params["policy_net"]))
    for _ in range(FT_STEPS):
        run(step_main, "main", zeros)
    return traj, float(state.temperature)


class TestCurriculumTransitionParity:
    @pytest.fixture(scope="class")
    def curriculum(self):
        ref = _build_reference()
        for mod in ref.modules():
            if isinstance(mod, torch.nn.Dropout):
                mod.p = 0.0
        params, stats = _convert_full(ref)
        rng = np.random.RandomState(7)
        ours_in, ref_in = _make_inputs(rng)
        target_np = rng.randint(0, K, size=(N,)).astype(np.int64)
        ref_traj, ref_temp = _run_reference_curriculum(ref, ref_in, target_np)
        with pytest.MonkeyPatch.context() as mp:
            ours_traj, ours_temp = _run_ours_curriculum(
                params, stats, ours_in, target_np, mp)
        return ref_traj, ours_traj, ref_temp, ours_temp

    def test_temperature_parity(self, curriculum):
        _, _, ref_temp, ours_temp = curriculum
        expect = TAU * DECAY ** ALT_PAIRS
        np.testing.assert_allclose(ref_temp, expect, rtol=1e-6)
        np.testing.assert_allclose(ours_temp, expect, rtol=1e-5)

    def test_trajectories_track_through_transition(self, curriculum):
        ref_traj, ours_traj, _, _ = curriculum
        assert len(ref_traj) == len(ours_traj) == 2 * ALT_PAIRS + FT_STEPS
        for t, (r, o) in enumerate(zip(ref_traj, ours_traj)):
            assert r["phase"] == o["phase"]
            # fp drift compounds over 30 steps; widen with depth
            rtol = 0.05 + 0.005 * t
            atol = 0.02 + 0.002 * t
            np.testing.assert_allclose(
                o["cls"], r["cls"], rtol=rtol, atol=atol,
                err_msg=f"cls loss diverged at step {t} ({r['phase']})")
            # compare the continuous selection-cost term, normalized for
            # boundary-sample correctness flips (see
            # TestTrainingCurveParity.test_loss_trajectories_track)
            o_norm = (o["policy"] - 10.0 * (1.0 - o["correct"])) / max(
                o["correct"], 1e-6)
            r_norm = (r["policy"] - 10.0 * (1.0 - r["correct"])) / max(
                r["correct"], 1e-6)
            np.testing.assert_allclose(
                o_norm, r_norm, rtol=rtol, atol=atol,
                err_msg=f"policy cost term diverged at step {t}")
            assert abs(o["correct"] - r["correct"]) <= 1.0 / N + 1e-6, \
                f"top-1 correctness diverged by >1 sample at step {t}"

    def test_selection_rates_track(self, curriculum):
        ref_traj, ours_traj, _, _ = curriculum
        for t, (r, o) in enumerate(zip(ref_traj, ours_traj)):
            np.testing.assert_allclose(
                o["sel"], r["sel"], atol=0.15,
                err_msg=f"selection rates diverged at step {t}")

    def test_overfit_through_boundary(self, curriculum):
        """Both sides must keep training across the optimizer re-init: the
        final finetune CE is well below the first main-phase CE."""
        ref_traj, ours_traj, _, _ = curriculum
        for traj in (ref_traj, ours_traj):
            assert traj[-1]["cls"] < traj[0]["cls"] * 0.9


# ---------------------------------------------------------------------------
# Full-curriculum parity (VERDICT r4 next item 6): warmup -> alternating ->
# finetune, pinning BOTH optimizer re-init boundaries (reference
# train_adamml.py:387-395 and 519-528) plus the multistep LR-scheduler epoch
# step inside the alternating loop (train_adamml.py:460-465).
#
# Scheduler semantics being pinned: warmup never steps the schedulers (the
# warmup stage, train_adamml.py:340-395, contains no scheduler.step), so it
# runs at the base LR; alternating/finetune step with an EXPLICIT epoch
# (scheduler.step(epoch+1)), which for MultiStepLR is the closed form
# base * 0.1^bisect_right(milestones, epoch) -- exactly our
# schedulers.lr_at_epoch. The torch side below REBINDS fresh MultiStepLR
# instances to the fresh optimizers at each boundary: that is what the
# reference's own resume path produces (it saves/loads scheduler state and
# rebuilds everything over live optimizers, train_adamml.py:259-302). In a
# FRESH reference run the once-created schedulers keep mutating the
# discarded pre-boundary optimizers, so the live LR never decays -- a
# reference defect we fix rather than replicate (see curriculum.py's run()
# comment).
# ---------------------------------------------------------------------------

WU_STEPS = 2        # warmup main-only steps (base LR, schedulers untouched)
FC_ALT_PAIRS = 4    # alternating (main, policy) pairs
FC_FT_STEPS = 3     # finetune main-only steps after the second re-init
MILESTONES = [2]    # LR drops x0.1 at epoch 2 of alternating AND finetune


def _run_reference_full(ref, ref_in, target_np):
    ref.policy_net.wrapper_gumbel_softmax = _st_argmax_torch_live(
        ref.policy_net)
    target = torch.from_numpy(target_np)

    def fresh():
        opt = torch.optim.SGD(ref.main_net.parameters(), LR, momentum=0.9,
                              weight_decay=WD, nesterov=False)
        p_opt = torch.optim.Adam(ref.policy_net.parameters(), P_LR,
                                 weight_decay=WD)
        return (opt, p_opt,
                torch.optim.lr_scheduler.MultiStepLR(opt, MILESTONES,
                                                     gamma=0.1),
                torch.optim.lr_scheduler.MultiStepLR(p_opt, MILESTONES,
                                                     gamma=0.1))

    traj, lrs = [], []
    opt, p_opt, _, _ = fresh()
    for _ in range(WU_STEPS):  # warmup: no scheduler.step anywhere
        lrs.append(opt.param_groups[0]["lr"])
        traj.append(_torch_phase_step(ref, ref_in, target, opt, p_opt,
                                      "main", [0.0, 0.0]))
    # warmup -> alternating boundary (reference train_adamml.py:387-395)
    opt, p_opt, sched, p_sched = fresh()
    for epoch in range(FC_ALT_PAIRS):
        lrs.append(opt.param_groups[0]["lr"])
        traj.append(_torch_phase_step(ref, ref_in, target, opt, p_opt,
                                      "main", [0.0, 0.0]))
        traj.append(_torch_phase_step(ref, ref_in, target, opt, p_opt,
                                      "policy", COST))
        ref.decay_temperature()          # train_adamml.py:516
        sched.step(epoch + 1)            # train_adamml.py:464-465
        p_sched.step(epoch + 1)
    # alternating -> finetune boundary (reference train_adamml.py:519-528)
    opt, p_opt, sched, p_sched = fresh()
    for epoch in range(FC_FT_STEPS):
        lrs.append(opt.param_groups[0]["lr"])
        traj.append(_torch_phase_step(ref, ref_in, target, opt, p_opt,
                                      "main", [0.0, 0.0]))
        sched.step(epoch + 1)            # train_adamml.py:576-577
        p_sched.step(epoch + 1)
    return traj, lrs, float(ref.policy_net.temperature)


def _run_ours_full(params, stats, ours_in, target_np, monkeypatch):
    from adamml_tpu.models import policy_net as our_pnet
    from adamml_tpu.models.adamml import AdaMML
    from adamml_tpu.train.optim import FusedSGD, adam_transform
    from adamml_tpu.train.schedulers import lr_at_epoch
    from adamml_tpu.train.steps import make_adamml_train_step
    from adamml_tpu.train.train_state import AdaMMLTrainState, StageFlags

    monkeypatch.setattr(our_pnet, "gumbel_decision", _st_argmax_jax)
    model = AdaMML(modality=tuple(MODALITY), num_classes=K, depth=18,
                   dropout=0.0, fusion_point="logits",
                   learnable_lf_weights=True, causality_modeling="lstm",
                   policy_input_size=160, dtype=jnp.float32)
    tx_main = FusedSGD(momentum=0.9, nesterov=False, weight_decay=WD)
    tx_policy = adam_transform(weight_decay=WD)
    state = AdaMMLTrainState.create(
        params, stats, tx_main.init(params["main_net"]),
        tx_policy.init(params["policy_net"]), temperature=TAU)
    common = dict(penalty_type="blockdrop", gammas=10.0, clip_gradient=None,
                  has_policy_params=True)
    step_main = make_adamml_train_step(model, tx_main, tx_policy,
                                       flags=StageFlags.main_phase(),
                                       **common)
    step_policy = make_adamml_train_step(model, tx_main, tx_policy,
                                         flags=StageFlags.policy_phase(),
                                         **common)
    target = jnp.asarray(target_np)
    zeros, cost = jnp.zeros((2,)), jnp.asarray(COST)
    rng = jax.random.PRNGKey(0)  # unused: decisions are deterministic
    traj, lrs = [], []

    def run(fn, phase, cw, lr, p_lr):
        nonlocal state
        state, m = fn(state, ours_in, target, jnp.asarray(lr),
                      jnp.asarray(p_lr), cw, rng)
        traj.append({"phase": phase, "cls": float(m["cls_loss"]),
                     "policy": float(m["policy_loss"]),
                     "correct": float(m["top1"]) / 100.0,
                     "sel": np.asarray(m["selection"])})

    def lr_of(epoch, base):
        return lr_at_epoch("multisteps", base, epoch, MILESTONES, 100)

    def reset_opts():
        nonlocal state
        state = state.replace(
            main_opt=tx_main.init(state.params["main_net"]),
            policy_opt=tx_policy.init(state.params["policy_net"]))

    for _ in range(WU_STEPS):  # warmup at base LR (curriculum lr_epoch=0)
        lrs.append(LR)
        run(step_main, "main", zeros, LR, P_LR)
    reset_opts()               # warmup -> alternating
    for epoch in range(FC_ALT_PAIRS):
        lrs.append(lr_of(epoch, LR))
        run(step_main, "main", zeros, lr_of(epoch, LR), lr_of(epoch, P_LR))
        run(step_policy, "policy", cost, lr_of(epoch, LR),
            lr_of(epoch, P_LR))
        state = state.replace(temperature=state.temperature * DECAY)
    reset_opts()               # alternating -> finetune
    for epoch in range(FC_FT_STEPS):
        lrs.append(lr_of(epoch, LR))
        run(step_main, "main", zeros, lr_of(epoch, LR), lr_of(epoch, P_LR))
    return traj, lrs, float(state.temperature)


class TestFullCurriculumParity:
    @pytest.fixture(scope="class")
    def full(self):
        ref = _build_reference()
        for mod in ref.modules():
            if isinstance(mod, torch.nn.Dropout):
                mod.p = 0.0
        params, stats = _convert_full(ref)
        rng = np.random.RandomState(7)
        ours_in, ref_in = _make_inputs(rng)
        target_np = rng.randint(0, K, size=(N,)).astype(np.int64)
        ref_traj, ref_lrs, ref_temp = _run_reference_full(ref, ref_in,
                                                          target_np)
        with pytest.MonkeyPatch.context() as mp:
            ours_traj, ours_lrs, ours_temp = _run_ours_full(
                params, stats, ours_in, target_np, mp)
        return ref_traj, ours_traj, ref_lrs, ours_lrs, ref_temp, ours_temp

    def test_lr_schedules_identical_and_decay(self, full):
        """Our closed-form lr_at_epoch must equal torch's live MultiStepLR
        at every step, and the milestone must actually fire mid-run (the
        scheduler interaction must not be vacuously constant)."""
        _, _, ref_lrs, ours_lrs, _, _ = full
        np.testing.assert_allclose(ours_lrs, ref_lrs, rtol=1e-9)
        alt = ref_lrs[WU_STEPS:WU_STEPS + FC_ALT_PAIRS]
        assert alt[MILESTONES[0]] == pytest.approx(0.1 * alt[0])
        ft = ref_lrs[WU_STEPS + FC_ALT_PAIRS:]
        assert ft[0] == pytest.approx(LR)  # re-init restarts the schedule
        assert ft[MILESTONES[0]] == pytest.approx(0.1 * LR)

    def test_temperature_parity(self, full):
        *_, ref_temp, ours_temp = full
        expect = TAU * DECAY ** FC_ALT_PAIRS
        np.testing.assert_allclose(ref_temp, expect, rtol=1e-6)
        np.testing.assert_allclose(ours_temp, expect, rtol=1e-5)

    def test_trajectories_track_through_both_boundaries(self, full):
        ref_traj, ours_traj, *_ = full
        assert (len(ref_traj) == len(ours_traj)
                == WU_STEPS + 2 * FC_ALT_PAIRS + FC_FT_STEPS)
        for t, (r, o) in enumerate(zip(ref_traj, ours_traj)):
            assert r["phase"] == o["phase"]
            rtol = 0.05 + 0.005 * t
            atol = 0.02 + 0.002 * t
            np.testing.assert_allclose(
                o["cls"], r["cls"], rtol=rtol, atol=atol,
                err_msg=f"cls loss diverged at step {t} ({r['phase']})")
            o_norm = (o["policy"] - 10.0 * (1.0 - o["correct"])) / max(
                o["correct"], 1e-6)
            r_norm = (r["policy"] - 10.0 * (1.0 - r["correct"])) / max(
                r["correct"], 1e-6)
            np.testing.assert_allclose(
                o_norm, r_norm, rtol=rtol, atol=atol,
                err_msg=f"policy cost term diverged at step {t}")
            assert abs(o["correct"] - r["correct"]) <= 1.0 / N + 1e-6, \
                f"top-1 correctness diverged by >1 sample at step {t}"

    def test_selection_rates_track(self, full):
        ref_traj, ours_traj, *_ = full
        for t, (r, o) in enumerate(zip(ref_traj, ours_traj)):
            np.testing.assert_allclose(
                o["sel"], r["sel"], atol=0.15,
                err_msg=f"selection rates diverged at step {t}")

    def test_both_sides_trained(self, full):
        ref_traj, ours_traj, *_ = full
        for traj in (ref_traj, ours_traj):
            assert traj[-1]["cls"] < traj[0]["cls"] * 0.9
