"""Circuit driver: the user-facing analysis orchestrator.

API parity with ``phy_engine::circult`` (circuits/circuit.h:60-177):
``set_analyze_type`` / analysis settings / ``analyze()`` /
``digital_clk()`` / ``reset()``, plus result sampling back onto the
netlist objects (node voltages, branch currents, device runtime state).

TPU-native structure: ``analyze()`` lowers the netlist once per
structural version (engine.lower), then calls cached jitted kernels from
``engine.analog``.  Parameter-only edits (set_attribute) never recompile
— parameters are traced inputs.  The persistent transient clock
``tr_duration`` carries across calls exactly like the reference.
"""

from __future__ import annotations

import enum
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..netlist.netlist import Netlist, Node
from ..models.base import StampCtx, DeviceClass
from .environment import Environment
from . import analog
from .lower import lower_analog, AnalogIR


class AnalyzeType(enum.Enum):
    """analyze.h:7-16."""
    OP = 0
    DC = 1
    AC = 2
    ACOP = 3
    TR = 4
    TROP = 5


class ACSweepType(enum.Enum):
    """analyzer/AC.h:7-25."""
    SINGLE = 0
    LINEAR = 1
    LOG = 2


@dataclass
class ACSettings:
    sweep: ACSweepType = ACSweepType.SINGLE
    omega: float = 1.0
    omega_start: float = 1.0
    omega_stop: float = 1e6
    points: int = 10


@dataclass
class TRSettings:
    t_stop: float = 1e-3
    t_step: float = 1e-6
    # adaptive stepping (the reference's unwired adapt_step, realized
    # as bounded step-halving): t_step is the max/initial step
    adaptive: bool = False
    dt_min: float = 0.0              # 0 -> t_step / 1024
    max_attempts: int = 0            # 0 -> 4x the fixed-step count


class Circuit:
    def __init__(self, netlist: Optional[Netlist] = None,
                 env: Optional[Environment] = None,
                 dtype=jnp.float64,
                 solver: str = "auto",
                 sparse_threshold: int = 2048,
                 mesh=None):
        """``solver``: 'auto' | 'dense' | 'sparse' (env var
        PE_TPU_SOLVER overrides; threshold policy mirrors the
        reference's CUDA node threshold, circuit.h:115-121).

        ``mesh``: optional ``jax.sharding.Mesh`` — OP/DC and
        fixed-step TR solves of pure-analog circuits then run fully
        distributed (instance-sharded stamping + cooperative
        column-sharded factorization, parallel/dist_newton.py); no
        device holds the full system.  The AC ω grid shards over the
        mesh as an independent-sweep axis.  Adaptive TR and
        mixed-signal solves fall back to the single-device path."""
        import os as _os
        self.nl = netlist if netlist is not None else Netlist()
        self.env = env if env is not None else Environment()
        self.solver = _os.environ.get("PE_TPU_SOLVER", solver)
        self.mesh = mesh
        self.sparse_threshold = int(_os.environ.get(
            "PE_TPU_SPARSE_THRESHOLD", sparse_threshold))
        self.at = AnalyzeType.OP
        self.ac = ACSettings()
        self.tr = TRSettings()
        # gmin-stepping homotopy ladder length on OP/DC Newton failure
        # (0 disables; PE_TPU_GMIN_STEPS overrides)
        self.gmin_steps = int(_os.environ.get("PE_TPU_GMIN_STEPS", "8"))
        self.dtype = dtype
        self.tr_duration = 0.0     # persistent transient clock
        self.ac_sweep_results: List[Tuple[float, np.ndarray]] = []
        self.tr_history: Optional[np.ndarray] = None  # (steps, N) waveforms
        self.tr_times: Optional[np.ndarray] = None

        self._ir: Optional[AnalogIR] = None
        self._x = None               # last solution vector (device array)
        self._states = None          # device-state pytree
        self._digital = None         # DigitalEngine, built on demand
        self._drives = None          # last digital->analog drive arrays

    # -- settings (reference: set_analyze_type / get_analyze_setting) ----
    def set_analyze_type(self, at: AnalyzeType):
        self.at = at

    def get_netlist(self) -> Netlist:
        return self.nl

    # -- compilation -------------------------------------------------------
    def _digital_models(self):
        return [m for m in self.nl.live_models()
                if m.mdef.device_class == DeviceClass.DIGITAL]

    def prepare(self, force: bool = False) -> AnalogIR:
        """Lower the netlist (compile cache keyed on structural version)."""
        need_digital = bool(self._digital_models())
        if (self._ir is None or force or self._ir.version != self.nl.version):
            n_drive = 0
            if need_digital:
                from ..digital.engine import DigitalEngine
                self._digital = DigitalEngine(self.nl, self.env)
                n_drive = self._digital.n_drive_slots
            else:
                self._digital = None
            self._ir = lower_analog(self.nl, max_drive_slots=n_drive)
            self._ir.version = self.nl.version
            if self._digital is not None:
                self._digital.bind(self._ir.n_nodes)
            # seed solution vector from node voltages + branch currents
            # (warm restart / checkpoint resume)
            x = np.zeros(self._ir.n_unknowns)
            warm = False
            for i, node in enumerate(self._ir.node_list):
                x[i] = node.voltage.real
                warm = warm or node.voltage.real != 0.0
            for fam in self._ir.families:
                for inst in fam.instances:
                    for br in inst.branches:
                        if br.index >= 0 and br.current.real != 0.0:
                            x[br.index] = br.current.real
                            warm = True
            self._x = jnp.asarray(x, self.dtype) if warm else \
                analog.initial_x(self._ir, self.dtype)
            # seed device state from restored runtime (checkpoint resume)
            st = analog.initial_state(self._ir, self.dtype)
            for fam in self._ir.families:
                key = fam.mdef.id_name
                for i, inst in enumerate(fam.instances):
                    for sname in st.get(key, {}):
                        if sname in inst.runtime:
                            st[key][sname] = st[key][sname].at[i].set(
                                float(inst.runtime[sname]))
            self._states = st
            self._drives = None
        return self._ir

    def _params(self):
        """Repack parameter matrices (cheap; traced input, no recompile)."""
        ir = self.prepare()
        out = {}
        for fam in ir.families:
            P = np.zeros((len(fam.instances),
                          max(1, len(fam.mdef.param_order))))
            for i, inst in enumerate(fam.instances):
                if fam.mdef.param_order:
                    P[i, :] = fam.mdef.pack_params(inst.params)
            out[fam.mdef.id_name] = jnp.asarray(P, self.dtype)
        return out

    def _env_scalars(self):
        return analog.env_scalars(self.env)

    def _method(self) -> str:
        if self.solver in ("dense", "sparse"):
            return self.solver
        ir = self._ir
        n = ir.n_unknowns if ir is not None else 0
        return "sparse" if n >= self.sparse_threshold else "dense"

    # -- analysis ----------------------------------------------------------
    def analyze(self) -> bool:
        ir = self.prepare()
        at = self.at
        if at in (AnalyzeType.OP, AnalyzeType.DC):
            return self._analyze_op(mode="op" if at == AnalyzeType.OP else "dc")
        if at == AnalyzeType.TROP:
            ok = self._analyze_op(mode="trop")
            return ok and self._analyze_tr()
        if at == AnalyzeType.TR:
            return self._analyze_tr()
        if at == AnalyzeType.ACOP:
            if not self._analyze_op(mode="op"):
                return False
            return self._analyze_ac()
        if at == AnalyzeType.AC:
            if ir.nonlinear:
                # bias point first so nonlinear devices save their
                # linearization (circuit.h:199-209)
                if not self._analyze_op(mode="op"):
                    return False
            return self._analyze_ac()
        raise ValueError(f"unsupported analyze type {at}")

    def _analyze_op(self, mode: str) -> bool:
        ir = self._ir
        params = self._params()
        t0 = time.perf_counter()
        if (self.mesh is not None and mode in ("op", "dc")
                and self._drives is None):
            # distributed route: sharded stamping + cooperative
            # column-sharded factorization over the mesh
            from ..parallel.dist_newton import newton_solve_dist
            x, st_pad, okj = newton_solve_dist(
                ir, self.mesh, params, self._x, self._states,
                self._env_scalars(), mode=mode, dtype=self.dtype)
            ok = bool(okj)
            # decommit from the mesh + drop the instance padding so the
            # stored solution/state feed later single-device analyses
            x = jnp.asarray(np.asarray(x), self.dtype)
            st = self._unpad_states(ir, st_pad) if ok else self._states
        else:
            x, st, ok = _jit_newton(ir, self.dtype, mode,
                                    self._method())(
                params, self._x, self._states,
                jnp.asarray(self.tr_duration, self.dtype),
                self._env_scalars(), self._drives)
            ok = bool(ok)
            if not ok and self.gmin_steps > 0:
                x, st, ok = self._gmin_stepping(mode, params)
        self._profile_solve(mode, t0, x if ok else None, params, st)
        if ok:
            self._x, self._states = x, st
            self._writeback(np.asarray(x))
        return ok

    def _gmin_stepping(self, mode: str, params):
        """Gmin-stepping homotopy (convergence aid on OP/DC failure —
        the reference has none; its solve() simply returns false,
        circuit.h:892-985).  A large conductance from every node to
        ground makes the system near-linear; the ladder walks it back
        down to the environment's g_min, warm-starting each rung from
        the previous solution.  g_min is a traced scalar input, so the
        whole ladder reuses one compiled Newton kernel.  Rescue rungs
        run with a 1024-iteration budget (the default 64 mirrors the
        reference's cap, circuit.h:898; junction vlimit walks at
        2·Ut/iteration, so N series junctions legitimately need
        ~N·Vf/(2·Ut) iterations — ~350 for 20 diodes at 0.9 V).
        Classic failure case this rescues: long series diode strings
        whose internal nodes float (tests/test_homotopy.py)."""
        env = dict(self._env_scalars())
        # the rescue never steps below SPICE's GMIN=1e-12: a circuit
        # whose failure is a genuinely floating node (e.g. two
        # reverse-biased junctions in series) is singular at g_min=0,
        # and ngspice's gmin stepping likewise terminates AT GMIN
        g_final = max(float(env.get("g_min", 0.0)), 1e-12)
        n_steps = self.gmin_steps
        ladder = np.logspace(-2.0, np.log10(g_final), n_steps)
        fn = _jit_newton(self._ir, self.dtype, mode, self._method(),
                         max_iter=1024)
        x, st = self._x, self._states
        t = jnp.asarray(self.tr_duration, self.dtype)
        for g in ladder:
            env["g_min"] = float(g)
            x2, st2, ok = fn(params, x, st, t, env, self._drives)
            if not bool(ok):
                return x, st, False
            x, st = x2, st2
        # a Δx-stationary point is not necessarily a solution: systems
        # whose conductances are so large that the Δx tolerance cannot
        # resolve KCL (e.g. 100 V forced across a short diode string —
        # every junction limexp-saturated) pass the step test while
        # violating current balance by orders of magnitude.  Validate
        # the residual ROW-WISE against each equation's own magnitude
        # and refuse to report such a point as convergence.
        ctx = StampCtx(mode="op" if mode in ("op", "dc") else mode,
                       t=t, dt=jnp.zeros((), self.dtype), env=env)
        A, Z, _ = analog.assemble(self._ir, params, x, st,
                                  ctx, self._drives, self.dtype)
        resid = jnp.abs(A @ x - Z)
        row_scale = jnp.abs(A) @ jnp.abs(x) + jnp.abs(Z)
        rel = float(jnp.max(resid / jnp.maximum(row_scale, 1e-30)))
        if not np.isfinite(rel) or rel > 1e-6:
            return x, st, False
        return x, st, True

    @staticmethod
    def _unpad_states(ir, st_pad):
        """Truncate tp_pad_ir's instance padding back to the real
        instance counts (and decommit from the mesh)."""
        out = {}
        for fam in ir.families:
            key = fam.mdef.id_name
            n = len(fam.instances)
            out[key] = {k: jnp.asarray(np.asarray(v)[:n])
                        for k, v in st_pad.get(key, {}).items()}
        return out

    def _profile_solve(self, tag: str, t0: float, x, params, states):
        """Env-gated per-solve report (the reference's
        PHY_ENGINE_PROFILE_SOLVE[_VALIDATE], circuit.h:35-57,1359-1479:
        wall breakdown + sampled residual check on stderr)."""
        if os.environ.get("PE_TPU_PROFILE_SOLVE", "") in ("", "0"):
            return
        wall_ms = (time.perf_counter() - t0) * 1e3
        ir = self._ir
        line = (f"[pe-tpu-profile] {tag}: unknowns={ir.n_unknowns} "
                f"nodes={ir.n_nodes} method={self._method()} "
                f"wall_ms={wall_ms:.2f} ok={x is not None}")
        if x is not None and os.environ.get(
                "PE_TPU_PROFILE_SOLVE_VALIDATE", "") not in ("", "0"):
            ctx = StampCtx(mode="op" if tag in ("op", "dc") else tag,
                           t=jnp.asarray(self.tr_duration, self.dtype),
                           dt=jnp.zeros((), self.dtype),
                           env=self._env_scalars())
            A, Z, _ = analog.assemble(ir, params, x, states, ctx,
                                      self._drives, self.dtype)
            resid = float(jnp.max(jnp.abs(A @ x - Z)))
            line += f" max_residual={resid:.3e}"
        print(line, file=sys.stderr)

    def _analyze_tr(self) -> bool:
        if self.tr.adaptive:
            return self._analyze_tr_adaptive()
        ir = self._ir
        params = self._params()
        dt = self.tr.t_step
        num_steps = max(1, int(round(self.tr.t_stop / dt)))
        if self.mesh is not None and self._drives is None \
                and self._digital is None:
            # distributed fixed-step TR: sharded stamping +
            # cooperative factorization per Newton iteration
            from ..parallel.dist_newton import transient_dist
            x, st_pad, ok, xs = transient_dist(
                ir, self.mesh, params, self._x, self._states,
                self._env_scalars(), self.tr_duration, dt, num_steps,
                dtype=self.dtype)
            if ok:
                self._x = jnp.asarray(np.asarray(x), self.dtype)
                self._states = self._unpad_states(ir, st_pad)
                self.tr_history = np.asarray(xs)
                self.tr_times = self.tr_duration + dt * np.arange(
                    1, num_steps + 1)
                self.tr_duration += num_steps * dt
                self._writeback(np.asarray(x))
            return ok
        t0 = time.perf_counter()
        x, st, ok, xs = _jit_transient(ir, self.dtype, num_steps,
                                       self._method())(
            params, self._x, self._states, self._env_scalars(),
            jnp.asarray(self.tr_duration, self.dtype),
            jnp.asarray(dt, self.dtype), self._drives)
        if os.environ.get("PE_TPU_PROFILE_SOLVE", "") not in ("", "0"):
            wall = (time.perf_counter() - t0) * 1e3
            print(f"[pe-tpu-profile] tr: unknowns={ir.n_unknowns} "
                  f"steps={num_steps} method={self._method()} "
                  f"wall_ms={wall:.2f} "
                  f"ms_per_step={wall / num_steps:.4f} ok={bool(ok)}",
                  file=sys.stderr)
        ok = bool(ok)
        if ok:
            self._x, self._states = x, st
            self.tr_history = np.asarray(xs)
            self.tr_times = self.tr_duration + dt * np.arange(1, num_steps + 1)
            self.tr_duration += num_steps * dt
            self._writeback(np.asarray(x))
            self._observe_tr_substeps()
        return ok

    def _analyze_tr_adaptive(self) -> bool:
        """Step-halving transient: t_step is the max step; failed
        Newton solves retry at dt/2 down to dt_min."""
        ir = self._ir
        params = self._params()
        dt0 = self.tr.t_step
        n_fixed = max(1, int(round(self.tr.t_stop / dt0)))
        max_attempts = self.tr.max_attempts or 4 * n_fixed
        dt_min = self.tr.dt_min or dt0 / 1024.0
        x, st, ok, ts, xs, acc = _jit_transient_adaptive(
            ir, self.dtype, max_attempts, self._method())(
            params, self._x, self._states, self._env_scalars(),
            jnp.asarray(self.tr_duration, self.dtype),
            jnp.asarray(dt0, self.dtype),
            jnp.asarray(self.tr_duration + self.tr.t_stop, self.dtype),
            jnp.asarray(dt_min, self.dtype), self._drives)
        ok = bool(ok)
        if ok:
            keep = np.asarray(acc)
            self._x, self._states = x, st
            self.tr_history = np.asarray(xs)[keep]
            self.tr_times = np.asarray(ts)[keep]
            self.tr_duration += self.tr.t_stop
            self._writeback(np.asarray(x))
            self._observe_tr_substeps()
        return ok

    def _omega_grid(self) -> np.ndarray:
        a = self.ac
        if a.sweep == ACSweepType.SINGLE:
            return np.array([a.omega])
        if a.sweep == ACSweepType.LINEAR:
            return np.linspace(a.omega_start, a.omega_stop, a.points)
        return np.logspace(np.log10(a.omega_start), np.log10(a.omega_stop),
                           a.points)

    def _analyze_ac(self) -> bool:
        ir = self._ir
        params = self._params()
        grid = self._omega_grid()
        nw = len(grid)
        if self.mesh is not None and (
                nw < int(self.mesh.devices.size)
                or os.environ.get("PE_TPU_AC_DIST")):
            # cooperative single-system AC: too few omegas to occupy
            # the mesh as a sweep axis — factor each omega's 2n-real
            # block system with its COLUMNS sharded over the mesh
            # instead (parallel/dist_newton.ac_solve_dist; validated
            # residual + fallback)
            from ..parallel.dist_newton import ac_solve_dist
            try:
                xs = ac_solve_dist(ir, self.mesh, params, self._states,
                                   grid, self.dtype)
            except RuntimeError:
                return False
            if not np.all(np.isfinite(xs.view(np.float64))):
                return False
            self.ac_sweep_results = [(float(w), xs[i])
                                     for i, w in enumerate(grid)]
            self._writeback_complex(xs[-1])
            return True
        if self.mesh is not None:
            # shard the sweep grid over the mesh (the embarrassingly
            # parallel DCN/ICI fan-out axis of SURVEY §2.5) — pad to
            # the device count by repeating the last point
            from jax.sharding import NamedSharding, PartitionSpec
            ndev = int(self.mesh.devices.size)
            npad = (-nw) % ndev
            if npad:
                grid = np.concatenate([grid, np.full(npad, grid[-1])])
            omegas = jax.device_put(
                jnp.asarray(grid),
                NamedSharding(self.mesh,
                              PartitionSpec(tuple(self.mesh.axis_names))))
        else:
            omegas = jnp.asarray(grid)
        xs_re, xs_im = _jit_ac(ir)(params, self._states, omegas)
        xs = (np.asarray(xs_re) + 1j * np.asarray(xs_im))[:nw]
        omegas = jnp.asarray(grid[:nw])
        if not np.all(np.isfinite(xs)):
            return False
        self.ac_sweep_results = [(float(w), xs[i])
                                 for i, w in enumerate(np.asarray(omegas))]
        # write back the last sweep point like capture_solution_vector
        self._writeback_complex(xs[-1])
        return True

    # -- noise (TPU-native extension; no reference analogue) ----------------
    def _node_index(self, node: Node) -> int:
        ir = self.prepare()
        for i, nd in enumerate(ir.node_list):
            if nd is node:
                return i
        raise ValueError("node is not part of the lowered circuit")

    def noise(self, out_node: Node, src=None):
        """Small-signal noise sweep over the AC ω grid (SPICE .NOISE).

        ``out_node`` — node whose output voltage noise PSD [V²/Hz] is
        computed (adjoint-network method, engine/noise.py).  ``src`` —
        optional input V-source instance; its branch row provides the
        unit excitation for the input-referred PSD.  Runs an OP first
        so nonlinear devices hold their bias-point linearizations
        (same contract as AC, circuit.h:199-209).  Returns a
        ``NoiseResult`` or None when the bias point fails.

        The reference engine has no noise analysis at all (its
        bsim3v32.h:28-29 TODO lists the infrastructure as missing);
        this analysis is an extension past parity.
        """
        from .noise import noise_sweep, NoiseResult
        ir = self.prepare()
        if not self._analyze_op(mode="op"):
            return None
        out_idx = self._node_index(out_node)
        src_row = None
        if src is not None:
            brs = getattr(src, "branches", ())
            if not brs or brs[0].index < 0:
                raise ValueError(
                    "noise src must be a branch device (V source)")
            src_row = int(brs[0].index)
        omegas = jnp.asarray(self._omega_grid())
        env = self._env_scalars()
        fn = jax.jit(lambda p, x, st, w: noise_sweep(
            ir, p, x, st, w, out_idx, src_row, env, self.dtype))
        onoise, gain2, contribs = fn(self._params(), self._x,
                                     self._states, omegas)
        return NoiseResult(np.asarray(omegas) / (2.0 * np.pi),
                           onoise, gain2, contribs)

    def _out_index(self, out) -> int:
        """Unknown-vector index of an output spec: a Node (its
        voltage) or a branch device (its branch current)."""
        if isinstance(out, Node):
            return self._node_index(out)
        brs = getattr(out, "branches", ())
        if brs and brs[0].index >= 0:
            return int(brs[0].index)
        raise ValueError("output must be a node or a branch device")

    def sens(self, out):
        """SPICE .SENS (DC) — sensitivity of an output to every
        parameter of every device (extension past parity; the
        reference has no sensitivity analysis).

        ``out``: a Node (output voltage) or a branch device such as a
        V source (output = its branch current).  Runs an OP, then one
        reverse-mode sweep through the differentiable assembly prices
        d(out)/d(param) for the complete parameter set at the cost of
        a single transposed solve (engine/sens.py).  Returns a
        ``SensResult`` or None when the bias point fails."""
        from .sens import sens_op, SensResult
        ir = self.prepare()
        if not self._analyze_op(mode="op"):
            return None
        out_idx = self._out_index(out)
        params = self._params()
        env = self._env_scalars()
        fn = jax.jit(lambda p, x, st: sens_op(
            ir, p, x, st, env, out_idx, self._drives, self.dtype))
        grads = fn(params, self._x, self._states)
        return SensResult(ir, grads, params)

    def sens_ac(self, out):
        """SPICE .SENS (AC) — d|V(out)|/d(param) over the AC ω grid,
        chained through the bias point and the saved small-signal
        linearizations (extension past parity).  Returns
        ``(freqs, mag, SensResult)`` — each SensResult row value is an
        (nω,) array — or None when the bias point fails."""
        from .sens import sens_ac, SensResult
        ir = self.prepare()
        if not self._analyze_op(mode="op"):
            return None
        out_idx = self._out_index(out)
        params = self._params()
        env = self._env_scalars()
        omegas = jnp.asarray(self._omega_grid())
        fn = jax.jit(lambda p, x, st, w: sens_ac(
            ir, p, x, st, env, out_idx, w, self._drives, self.dtype))
        mag, grads = fn(params, self._x, self._states, omegas)
        return (np.asarray(omegas) / (2.0 * np.pi), np.asarray(mag),
                SensResult(ir, grads, params))

    def _run_batched_op(self, params_b, nv: int, mesh):
        """Shared tail of the sweep analyses: run ``batched_op`` over
        the (nv, ...) parameter batch, optionally sharded over every
        axis of ``mesh`` (lanes pad up to the device count by
        repeating the last lane, and the padding is dropped from the
        results)."""
        from ..parallel.batch import batch_state, batch_x, batched_op
        ir = self._ir
        B = nv
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            ndev = int(mesh.devices.size)
            npad = (-nv) % ndev
            if npad:
                params_b = {
                    k: jnp.concatenate(
                        [v, jnp.repeat(v[-1:], npad, axis=0)])
                    for k, v in params_b.items()}
                B = nv + npad
            sh = NamedSharding(mesh, PartitionSpec(
                tuple(mesh.axis_names)))
            params_b = jax.device_put(params_b, sh)
        x_b = batch_x(ir, B, self.dtype)
        st_b = batch_state(ir, B, self.dtype)
        if mesh is not None:
            x_b = jax.device_put(x_b, sh)
            st_b = jax.device_put(st_b, sh)
        x, st, ok = jax.jit(
            lambda p, xx, ss: batched_op(ir, p, xx, ss,
                                         self._env_scalars(),
                                         dtype=self.dtype))(
            params_b, x_b, st_b)
        return (np.asarray(x)[:nv], np.asarray(ok)[:nv],
                {k: np.asarray(v)[:nv] for k, v in params_b.items()})

    def _family_col(self, inst, pname: str):
        ir = self.prepare()
        for fam in ir.families:
            if inst in fam.instances:
                return (fam.mdef.id_name, fam.instances.index(inst),
                        fam.mdef.param_order.index(pname))
        raise ValueError("instance is not part of the lowered circuit")

    def dc_sweep(self, inst, pname: str, values, out=None, mesh=None):
        """SPICE .DC — step one device parameter (classically a
        source voltage) over a grid, solving the operating point at
        EVERY grid value in one batched device program (``vmap`` over
        the grid onto the batched MXU solve).  The reference's DC
        analysis is an OP alias with an empty settings struct
        (analyzer/DC.h:9) — stepped .DC is an extension past parity.

        ``inst``/``pname``: the swept device parameter (e.g. a VDC's
        ``"V"``).  ``out``: optional Node or branch device; when given
        the result's ``out`` field holds its (nv,) trace directly.
        ``mesh``: optional jax Mesh — the grid then shards over every
        mesh axis (the DCN/ICI sweep fan-out of SURVEY §2.5).
        Mixed-signal circuits are not swept (digital drives are
        per-tick state).  Does not disturb the circuit's stored
        solution.  Returns a :class:`SweepResult`."""
        ir = self.prepare()
        if ir.n_drive_slots:
            raise ValueError("dc_sweep does not support mixed-signal "
                             "circuits (use digital_clk interleave)")
        key_, i, j = self._family_col(inst, pname)
        vals = np.asarray(values, np.float64)
        nv = len(vals)
        params_b = {}
        base = self._params()
        for k, P in base.items():
            params_b[k] = jnp.broadcast_to(P, (nv,) + P.shape)
        params_b[key_] = params_b[key_].at[:, i, j].set(
            jnp.asarray(vals, self.dtype))
        x, ok, pb = self._run_batched_op(params_b, nv, mesh)
        res = SweepResult(ir, vals, x, ok, pb)
        if out is not None:
            res.out = res.trace(out)
        return res

    def temp_sweep(self, temps, out=None, mesh=None):
        """Global temperature sweep (.STEP TEMP class, extension past
        parity): the OP is solved at every temperature in one batched
        device program.  Each lane sets the ``Temp`` parameter of
        EVERY device family that has one (the reference's
        load_temperature propagation role, circuit.h:575-889, realized
        as a parameter-column broadcast).  ``mesh``: optional jax Mesh
        to shard the grid.  Returns a :class:`SweepResult` (``values``
        = temps in °C)."""
        ir = self.prepare()
        if ir.n_drive_slots:
            raise ValueError("temp_sweep does not support mixed-signal "
                             "circuits")
        temps = np.asarray(temps, np.float64)
        nv = len(temps)
        tj = jnp.asarray(temps, self.dtype)
        base = self._params()
        params_b = {}
        for fam in ir.families:
            k = fam.mdef.id_name
            P = jnp.broadcast_to(base[k], (nv,) + base[k].shape)
            if "Temp" in fam.mdef.param_order:
                j = fam.mdef.param_order.index("Temp")
                P = P.at[:, :, j].set(tj[:, None])
            params_b[k] = P
        x, ok, pb = self._run_batched_op(params_b, nv, mesh)
        res = SweepResult(ir, temps, x, ok, pb)
        if out is not None:
            res.out = res.trace(out)
        return res

    def monte_carlo(self, jitter, n: int, key=None,
                    analysis: str = "op", t_stop: float = 0.0,
                    t_step: float = 0.0, mesh=None):
        """Monte-Carlo over lognormal parameter jitter — the workload
        class the reference covers with independent process runs; here
        it is ONE batched device program (parallel/batch.py).

        ``jitter``: {family id_name: {param: rel_sigma}}.
        ``analysis``: 'op' (default) or 'tr' (fixed-step transient of
        ``t_stop``/``t_step``, waveforms kept per lane).  ``mesh``:
        optional jax Mesh — 'op' lanes shard over it ('tr' with
        waveforms stays local; use parallel.mesh.sharded_batched_
        transient for final-state-only sharded MC transients).
        Returns a :class:`SweepResult` whose ``params`` hold the
        sampled values (lane i's parameters) — for 'tr' the
        ``history`` field is (n, steps, N)."""
        from ..parallel.batch import (batch_state, batch_x,
                                      batched_transient)
        ir = self.prepare()
        if ir.n_drive_slots:
            raise ValueError("monte_carlo does not support "
                             "mixed-signal circuits")
        if key is None:
            key = jax.random.PRNGKey(0)
        base = self._params()          # live (possibly edited) params
        params_b = {}
        for fam in ir.families:
            k = fam.mdef.id_name
            P = jnp.broadcast_to(base[k], (n,) + base[k].shape)
            if jitter and k in jitter:
                for pname, sigma in jitter[k].items():
                    col = fam.mdef.param_order.index(pname)
                    key, sub = jax.random.split(key)
                    factor = jnp.exp(sigma * jax.random.normal(
                        sub, (n, P.shape[1])))
                    P = P.at[:, :, col].multiply(factor)
            params_b[k] = P
        env = self._env_scalars()
        if analysis == "op":
            x, ok, pb = self._run_batched_op(params_b, n, mesh)
            return SweepResult(ir, np.arange(n), x, ok, pb)
        if analysis != "tr":
            raise ValueError("analysis must be 'op' or 'tr'")
        x_b = batch_x(ir, n, self.dtype)
        st_b = batch_state(ir, n, self.dtype)
        dt = t_step or self.tr.t_step
        steps = max(1, int(round((t_stop or self.tr.t_stop) / dt)))
        x, st, ok, xs = jax.jit(
            lambda p, xx, ss: batched_transient(
                ir, p, xx, ss, env, jnp.asarray(0.0, self.dtype),
                jnp.asarray(dt, self.dtype), steps, self.dtype,
                keep_trace=True))(params_b, x_b, st_b)
        res = SweepResult(ir, np.arange(n), np.asarray(x),
                          np.asarray(ok),
                          {k: np.asarray(v) for k, v in params_b.items()})
        res.history = np.asarray(xs)
        res.times = dt * np.arange(1, steps + 1)
        return res

    def four(self, fundamental: float, out, harmonics: int = 9):
        """SPICE .FOUR — Fourier analysis of the last transient
        waveform at ``out`` (extension past parity; the reference has
        no Fourier post-processor).

        Uses the final ``1/fundamental`` window of ``tr_history``
        (classic SPICE convention), linearly resampled onto a uniform
        grid, and returns a :class:`FourierResult` with amplitudes/
        phases of harmonics 0..``harmonics`` of ``fundamental`` plus
        THD (ratio of harmonics 2+ RMS to the fundamental)."""
        if self.tr_history is None or self.tr_times is None:
            raise ValueError("run a transient first (.FOUR analyzes "
                             "tr_history)")
        idx = self._out_index(out)
        t = np.asarray(self.tr_times, np.float64)
        y = np.asarray(self.tr_history[:, idx], np.float64)
        T = 1.0 / float(fundamental)
        t_end = t[-1]
        t_start = t_end - T
        if t_start < t[0] - 1e-15:
            raise ValueError("transient shorter than one fundamental "
                             "period")
        m = max(64, 16 * (harmonics + 1))
        tg = np.linspace(t_start, t_end, m, endpoint=False)
        yg = np.interp(tg, t, y)
        coeff = np.fft.rfft(yg) / m
        n_avail = min(harmonics, m // 2 - 1)
        amps = np.zeros(harmonics + 1)
        phases = np.zeros(harmonics + 1)
        amps[0] = coeff[0].real
        for k in range(1, n_avail + 1):
            amps[k] = 2.0 * np.abs(coeff[k])
            # SPICE phase convention: component as A·cos(kωt + φ)
            # relative to the window start
            phases[k] = np.degrees(np.angle(coeff[k]))
        return FourierResult(float(fundamental), amps, phases)

    def tf(self, out_node: Node, src):
        """SPICE .TF — DC small-signal transfer function (extension
        past parity, like ``noise``; the reference has neither).

        Returns ``(gain, rin, rout)``: ``gain`` = dV(out)/dV(src),
        ``rin`` = input resistance seen by the V-source ``src``,
        ``rout`` = output resistance at ``out_node`` (computed with the
        source shorted, i.e. its branch row active — the standard .TF
        convention).  Runs an OP first so nonlinear devices hold their
        bias linearizations; solves the DC-linearized system once
        forward (unit E on the source row) and once at the output
        (unit current into ``out_node``)."""
        from ..ops.linsolve import dense_solve
        from .analog import assemble_ac
        ir = self.prepare()
        if not self._analyze_op(mode="op"):
            return None
        out_idx = self._node_index(out_node)
        brs = getattr(src, "branches", ())
        if not brs or brs[0].index < 0:
            raise ValueError("tf src must be a branch device (V source)")
        src_row = int(brs[0].index)

        def solve2(p, st):
            Ar, _Ai, _Zr, _Zi = assemble_ac(ir, p, st,
                                            jnp.asarray(0.0, self.dtype),
                                            self.dtype)
            n = ir.n_unknowns
            bf = jnp.zeros(n, self.dtype).at[src_row].set(1.0)
            bz = jnp.zeros(n, self.dtype).at[out_idx].set(1.0)
            xf = dense_solve(Ar, bf)
            xz = dense_solve(Ar, bz)
            return xf[out_idx], xf[src_row], xz[out_idx]

        g, i_src, r_out = jax.jit(solve2)(self._params(), self._states)
        # the source branch current under unit E: rin = -E/i (the
        # branch constraint is v = E with current flowing out of +)
        i_src = float(i_src)
        rin = float("inf") if i_src == 0.0 else -1.0 / i_src
        return float(g), rin, float(r_out)

    def pz(self, out_node: Node, src):
        """SPICE .PZ — poles and zeros of the small-signal transfer
        v(out)/e(src) (extension past parity; the reference has no
        small-signal pole-zero analysis).

        Every device AC stamp is G + jωC (linear in ω), so one
        assembly at ω=1 yields both matrices: G = Re A, C = Im A.
        Poles solve det(G + sC) = 0 (generalized eigenproblem);
        zeros solve det([[G + sC, b_src], [e_outᵀ, 0]]) = 0 — the
        bordered pencil whose determinant is the transfer numerator.
        Returns ``(poles, zeros)`` as complex ndarrays in rad/s
        (finite eigenvalues only; infinite generalized eigenvalues
        correspond to the pencil's singular C directions, not
        dynamics).  Runs an OP first for nonlinear bias
        linearizations, like AC/noise/tf."""
        import scipy.linalg as sla
        from .analog import assemble_ac
        ir = self.prepare()
        if not self._analyze_op(mode="op"):
            return None
        out_idx = self._node_index(out_node)
        brs = getattr(src, "branches", ())
        if not brs or brs[0].index < 0:
            raise ValueError("pz src must be a branch device (V source)")
        src_row = int(brs[0].index)
        Ar, Ai, _Zr, _Zi = jax.jit(
            lambda p, st: assemble_ac(ir, p, st,
                                      jnp.asarray(1.0, self.dtype),
                                      self.dtype))(
            self._params(), self._states)
        G = np.asarray(Ar)
        C = np.asarray(Ai)
        n = ir.n_unknowns

        def finite_eigs(M0, M1):
            # det(M0 + s·M1) = 0  ->  M0 v = s·(−M1) v, s = λ directly
            lam = sla.eigvals(M0, -M1)
            lam = lam[np.isfinite(lam)]
            # scipy encodes some infinite generalized eigenvalues as
            # huge finite numbers when M1 is nearly singular; clip by
            # magnitude against the pencil scale
            scale = (np.linalg.norm(M0, np.inf) /
                     max(np.linalg.norm(M1, np.inf), 1e-300))
            return lam[np.abs(lam) < 1e6 * max(scale, 1.0)]

        poles = finite_eigs(G, C)
        b = np.zeros((n, 1))
        b[src_row, 0] = 1.0
        c_row = np.zeros((1, n))
        c_row[0, out_idx] = 1.0
        M0 = np.block([[G, b], [c_row, np.zeros((1, 1))]])
        M1 = np.block([[C, np.zeros((n, 1))],
                       [np.zeros((1, n + 1))]])
        zeros = finite_eigs(M0, M1)
        return poles, zeros

    # -- digital ------------------------------------------------------------
    def digital_clk(self) -> bool:
        """One digital tick (circuit.h:298-354)."""
        if self._digital is None:
            self.prepare()
        if self._digital is None:
            return True
        analog_v = self._node_voltages()
        # advance the Tsu/Th unsteady-state automata at tick time (TR
        # substeps between ticks feed them too — _analyze_tr)
        self._digital.observe_analog(analog_v, self.tr_duration)
        drives = self._digital.tick(analog_v)
        self._drives = drives
        return True

    def _observe_tr_substeps(self):
        """Feed every accepted TR substep's solution into the digital
        Tsu/Th automata so setup/hold X windows follow the analog
        trajectory between ticks (the per-TR-substep upgrade over the
        reference's per-tick sampling, and.h:161-363)."""
        eng = self._digital
        if eng is None or not eng.has_unsteady():
            return
        if self.tr_history is None or self.tr_times is None:
            return
        n = self._ir.n_nodes
        for t, row in zip(np.asarray(self.tr_times),
                          np.asarray(self.tr_history)):
            eng.observe_analog(row[:n], float(t))

    def digital_inputs(self) -> Dict[str, Any]:
        """Named runtime-settable INPUT devices (synth constants are
        excluded) — the name-based introspection the reference exposes
        through its C ABI sample layouts."""
        out = {}
        for m in self.nl.live_models():
            if m.mdef.digital_op == "INPUT" and \
                    not m.params.get("synth_const") and m.name:
                out[m.name] = m
        return out

    def digital_outputs(self) -> Dict[str, Any]:
        """Named OUTPUT/display devices."""
        return {m.name: m for m in self.nl.live_models()
                if m.mdef.digital_op in ("OUTPUT", "OUTPUT8") and m.name}

    def digital_run(self, schedule) -> "DigitalTrace":
        """Run ``len(schedule)`` digital ticks in ONE device program
        (lax.scan) — the fast path for clocking pure-digital designs.

        ``schedule``: per tick, a dict {INPUT model -> value} overriding
        that device's attribute for the tick; unlisted INPUT devices
        hold their current attribute value.  A value is either a 4-state
        code (0/1/2/3, broadcast to all 32 stimulus lanes) or a tuple
        ``(v_word, u_word)`` of 32-bit planes giving each lane its own
        4-state value — the bit-packed multi-vector mode that mirrors
        the reference's u64 cone batching.  Mixed-signal circuits
        (analog drives or VERILOG_MODULE) must use digital_clk().
        Returns a :class:`DigitalTrace`.
        """
        eng, fs, FV, FU = self._compile_schedule(schedule)
        hist = eng.run_ticks(fs, FV, FU, self._node_voltages())
        return DigitalTrace(eng, hist)

    def _compile_schedule(self, schedule):
        if self._digital is None:
            self.prepare()
        eng = self._digital
        if eng is None:
            raise ValueError("no digital content")
        ir = eng.ir
        sig_of = {}
        base = {}
        for inst, out_sigs in ir.inputs:
            if inst.mdef.digital_op == "INPUT":
                sig_of[id(inst)] = out_sigs[0]
                base[out_sigs[0]] = int(
                    inst.params.get("boolean", 2)) & 3
        fs = sorted(base)
        pos = {s: k for k, s in enumerate(fs)}
        T = len(schedule)
        FV = np.zeros((T, len(fs)), np.uint32)
        FU = np.zeros((T, len(fs)), np.uint32)
        FULL32 = np.uint32(0xFFFFFFFF)
        for t, entry in enumerate(schedule):
            codes = dict(base)
            for inst, code in entry.items():
                s = sig_of.get(id(inst))
                if s is None:
                    raise ValueError("not a digital INPUT device")
                codes[s] = code
            for s, code in codes.items():
                if isinstance(code, tuple):
                    FV[t, pos[s]] = np.uint32(code[0] & 0xFFFFFFFF)
                    FU[t, pos[s]] = np.uint32(code[1] & 0xFFFFFFFF)
                else:
                    code = int(code) & 3
                    FV[t, pos[s]] = FULL32 if (code & 1) else 0
                    FU[t, pos[s]] = FULL32 if (code & 2) else 0
        return eng, np.array(fs, np.int32), FV, FU

    def digital_run_batch(self, schedules, watch_nodes, mesh=None,
                          axis: str = "batch"):
        """Run B independent copies of the design, one schedule each
        (all the same length), vmapped — and sharded over ``mesh`` when
        given — on the instance axis.  ``watch_nodes``: nets whose
        per-tick 4-state codes are recorded.  Returns int8 codes of
        shape [B, T, len(watch_nodes)] (lane 0)."""
        eng = self._digital or (self.prepare() and self._digital)
        if self._digital is None:
            self.prepare()
        eng = self._digital
        compiled = [self._compile_schedule(s) for s in schedules]
        fs = compiled[0][1]
        FV = np.stack([c[2] for c in compiled])
        FU = np.stack([c[3] for c in compiled])
        watch = [eng.ir.node_sig.get(id(n), 0) for n in watch_nodes]
        hv, hu = eng.run_ticks_batched(fs, FV, FU, watch=watch,
                                       mesh=mesh, axis=axis)
        v = (np.asarray(hv) & 1).astype(np.int8)
        u = (np.asarray(hu) & 1).astype(np.int8)
        return v | (u << 1)

    def _node_voltages(self) -> np.ndarray:
        ir = self.prepare()
        if self._x is None:
            return np.zeros(ir.n_nodes)
        return np.asarray(self._x)[:ir.n_nodes]

    # -- result access --------------------------------------------------------
    def _writeback(self, x: np.ndarray):
        ir = self._ir
        for i, node in enumerate(ir.node_list):
            node.voltage = complex(x[i])
        for fam in ir.families:
            st = {k: np.asarray(v) for k, v in self._states[fam.mdef.id_name].items()}
            for i, inst in enumerate(fam.instances):
                for k, br in enumerate(inst.branches):
                    br.current = complex(x[br.index])
                inst.runtime = {k: float(v[i]) for k, v in st.items()}

    def _writeback_complex(self, x: np.ndarray):
        ir = self._ir
        for i, node in enumerate(ir.node_list):
            node.voltage = complex(x[i])
        for fam in ir.families:
            for inst in fam.instances:
                for k, br in enumerate(inst.branches):
                    br.current = complex(x[br.index])

    def node_voltage(self, node: Node) -> complex:
        if node.is_ground:
            return 0.0 + 0.0j
        return node.voltage

    def node_digital(self, node: Node) -> int:
        """4-state code (0=L,1=H,2=X,3=Z) of a digital net."""
        return node.digital

    def tr_waveform(self, node: Node) -> np.ndarray:
        """Time series of a node voltage over the last TR run."""
        idx = self._ir.index_of(node)
        if idx < 0:
            return np.zeros(0 if self.tr_history is None
                            else self.tr_history.shape[0])
        return self.tr_history[:, idx]

    def reset(self):
        """reset() (circuit.h:446-465): clear solution + transient clock."""
        self.tr_duration = 0.0
        self.ac_sweep_results = []
        self.tr_history = None
        self._ir = None
        self._x = None
        self._states = None
        self._digital = None
        self._drives = None
        for n in self.nl.all_nodes():
            n.voltage = 0.0 + 0.0j


# ---------------------------------------------------------------------------
# jit caches keyed on (IR identity, dtype, static sizes)
# ---------------------------------------------------------------------------

_NEWTON_CACHE: Dict[Tuple[int, Any, str], Any] = {}
_TRANS_CACHE: Dict[Tuple[int, Any, int], Any] = {}
_AC_CACHE: Dict[int, Any] = {}


def _jit_newton(ir: AnalogIR, dtype, mode: str, method: str = "dense",
                max_iter: Optional[int] = None):
    key = (id(ir), dtype, mode, method, max_iter)
    if key not in _NEWTON_CACHE:
        kw = {} if max_iter is None else {"max_iter": max_iter}

        def run(params, x0, states, t, env, drives):
            ctx = StampCtx(mode=mode, t=t, dt=jnp.zeros((), dtype), env=env)
            return analog.newton_solve(ir, params, x0, states, ctx,
                                       drives, dtype, method=method, **kw)
        _NEWTON_CACHE[key] = jax.jit(run)
    return _NEWTON_CACHE[key]


def _jit_transient_adaptive(ir: AnalogIR, dtype, max_attempts: int,
                            method: str = "dense"):
    key = ("adapt", id(ir), dtype, max_attempts, method)
    if key not in _TRANS_CACHE:
        def run(params, x0, states, env, t0, dt0, t_stop, dt_min,
                drives):
            return analog.transient_adaptive(
                ir, params, x0, states, env, t0, dt0, t_stop,
                max_attempts, dt_min, drives, dtype, method=method)
        _TRANS_CACHE[key] = jax.jit(run)
    return _TRANS_CACHE[key]


def _jit_transient(ir: AnalogIR, dtype, num_steps: int,
                   method: str = "dense"):
    key = (id(ir), dtype, num_steps, method)
    if key not in _TRANS_CACHE:
        def run(params, x0, states, env, t0, dt, drives):
            return analog.transient(ir, params, x0, states, env, t0, dt,
                                    num_steps, drives, dtype,
                                    method=method)
        _TRANS_CACHE[key] = jax.jit(run)
    return _TRANS_CACHE[key]


def _jit_ac(ir: AnalogIR):
    key = id(ir)
    if key not in _AC_CACHE:
        def run(params, states, omegas):
            return analog.ac_sweep(ir, params, states, omegas)
        _AC_CACHE[key] = jax.jit(run)
    return _AC_CACHE[key]


class FourierResult:
    """Result of Circuit.four: harmonic amplitudes (index k =
    harmonic k of the fundamental; index 0 = DC), phases in degrees,
    and total harmonic distortion."""

    def __init__(self, f0: float, amps: np.ndarray, phases: np.ndarray):
        self.fundamental = f0
        self.amps = amps
        self.phases = phases

    @property
    def thd(self) -> float:
        """sqrt(Σ_{k≥2} A_k²) / A_1 (the SPICE .FOUR THD, as a ratio;
        multiply by 100 for percent)."""
        a1 = self.amps[1]
        if a1 == 0.0:
            return float("inf")
        return float(np.sqrt(np.sum(self.amps[2:] ** 2)) / a1)


class SweepResult:
    """Result of Circuit.dc_sweep / Circuit.monte_carlo.

    ``values`` — the sweep grid (or lane indices for MC); ``x`` —
    (nv, N) solutions; ``ok`` — (nv,) per-point convergence;
    ``params`` — the per-lane parameter matrices actually used
    (family id → (nv, n_inst, n_param)).  For MC transients,
    ``history`` is (nv, steps, N) and ``times`` the step times."""

    def __init__(self, ir, values, x, ok, params):
        self.ir = ir
        self.values = np.asarray(values)
        self.x = x
        self.ok = ok
        self.params = params
        self.out = None
        self.history = None
        self.times = None

    def _idx(self, out) -> int:
        if isinstance(out, Node):
            i = self.ir.index_of(out)
            if i < 0:
                raise ValueError("node is not a lowered analog net")
            return i
        brs = getattr(out, "branches", ())
        if brs and brs[0].index >= 0:
            return int(brs[0].index)
        raise ValueError("output must be a node or a branch device")

    def trace(self, out) -> np.ndarray:
        """(nv,) value of a node voltage / branch current per point."""
        return self.x[:, self._idx(out)]

    def waveform(self, out) -> np.ndarray:
        """(nv, steps) transient waveforms (MC 'tr' only)."""
        if self.history is None:
            raise ValueError("no transient history on this result")
        return self.history[:, :, self._idx(out)]

    def param_of(self, inst, pname: str) -> np.ndarray:
        """(nv,) the sampled/swept parameter value per lane."""
        for fam in self.ir.families:
            if inst in fam.instances:
                i = fam.instances.index(inst)
                j = fam.mdef.param_order.index(pname)
                return self.params[fam.mdef.id_name][:, i, j]
        raise KeyError("instance is not part of the lowered circuit")


class DigitalTrace:
    """Per-tick 4-state history from Circuit.digital_run (lane 0)."""

    def __init__(self, eng, hist):
        sv, su = hist
        self._eng = eng
        self.sv = np.asarray(sv)
        self.su = np.asarray(su)

    def __len__(self):
        return self.sv.shape[0]

    def node_codes(self, node, lane: int = 0) -> np.ndarray:
        """4-state code of a net at every tick (one stimulus lane)."""
        sig = self._eng.ir.node_sig.get(id(node))
        if sig is None:
            return np.full(len(self), 2, np.int8)
        v = ((self.sv[:, sig] >> np.uint32(lane)) & 1).astype(np.int8)
        u = ((self.su[:, sig] >> np.uint32(lane)) & 1).astype(np.int8)
        return v | (u << 1)

    def bus_values(self, nodes, lane: int = 0) -> np.ndarray:
        """Unsigned value of a bus (LSB-first node list) per tick;
        unknown bits read as 0."""
        out = np.zeros(len(self), np.int64)
        for i, n in enumerate(nodes):
            c = self.node_codes(n, lane)
            out |= ((c == 1).astype(np.int64)) << i
        return out

    def bus_values_lanes(self, nodes) -> np.ndarray:
        """(T, 32) bus values across every stimulus lane."""
        T = len(self)
        out = np.zeros((T, 32), np.int64)
        for i, n in enumerate(nodes):
            sig = self._eng.ir.node_sig.get(id(n))
            if sig is None:
                continue
            v = self.sv[:, sig]
            u = self.su[:, sig]
            for lane in range(32):
                bit = ((v >> np.uint32(lane)) & 1) & ~((u >> np.uint32(lane)) & 1)
                out[:, lane] |= bit.astype(np.int64) << i
        return out
