"""Reference hooks.py compatibility: Python-2 translation, espressopp shim,
storage adapters (ref: examples/atrp_lj/hooks.py, start_simulation.py:220-228).
"""

import os
import textwrap

import numpy as np
import pytest

from chemlab_tpu import hooks_compat

REF_HOOKS = "/root/reference/examples/atrp_lj/hooks.py"


def test_py2_print_translation():
    src = textwrap.dedent("""\
        def hook_end(system, integrator, ar, gt, args):
            xs = [1, 2]
            print xs
            print ('ok {}'.format(len(xs)))
            return True
    """)
    out = hooks_compat.py2_to_py3(src)
    assert out is not None
    ns = {}
    exec(compile(out, "<t>", "exec"), ns)
    assert ns["hook_end"](None, None, None, None, None) is True


def test_py2_translation_passthrough_and_failure():
    assert hooks_compat.py2_to_py3("x = 1\n") == "x = 1\n"
    assert hooks_compat.py2_to_py3("def f(:\n") is None


def test_random_compat_sample_accepts_sets():
    rc = hooks_compat._RandomCompat()
    picked = rc.sample({10, 20, 30, 40}, 2)
    assert len(picked) == 2 and set(picked) <= {10, 20, 30, 40}
    assert rc.randint(1, 1) == 1  # delegation


def test_espp_shim_importable():
    hooks_compat.install_espp_shim()
    import espressopp
    assert hasattr(espressopp.analysis, "MaxPID")
    assert hasattr(espressopp.analysis, "AngleDistribution")


@pytest.fixture(scope="module")
def melt_ctx():
    from chemlab_tpu import testsystems
    from chemlab_tpu.start_simulation import SimulationContext

    built, systop, _ = testsystems.build_melt(n_mols=40, reactive=True)
    return SimulationContext(args=None, systop=systop, built=built,
                             state=built.state)


def test_storage_adapter_roundtrip(melt_ctx):
    session = hooks_compat.HookSession(melt_ctx)
    storage = session.system.storage
    assert storage.particleExists(1)
    assert not storage.particleExists(0)
    p = storage.getParticle(1)
    old_type = p.type
    storage.modifyParticle(1, "type", old_type + 1)
    storage.modifyParticle(1, "state", 7)
    storage.modifyParticle(1, "mass", 2.5)
    session.commit()
    st = melt_ctx.state
    assert int(st.type_id[0]) == old_type + 1
    assert int(st.chem_state[0]) == 7
    assert float(st.mass[0]) == pytest.approx(2.5)


def test_max_pid_observable(melt_ctx):
    hooks_compat.install_espp_shim()
    import espressopp
    session = hooks_compat.HookSession(melt_ctx)
    max_pid = espressopp.analysis.MaxPID(session.system).compute()
    n_active = int(np.asarray(melt_ctx.state.active).sum())
    assert max_pid == n_active


def test_angle_distribution_observable(melt_ctx):
    hooks_compat.install_espp_shim()
    import espressopp
    session = hooks_compat.HookSession(melt_ctx)
    obs = espressopp.analysis.AngleDistribution(session.system)
    obs.load_from_topology_manager(session.system.topology_manager)
    hist = obs.compute(50)
    assert hist.shape == (50,)
    n_angles = int((np.asarray(melt_ctx.state.angles.idx[:, 0]) >= 0).sum())
    assert hist.sum() == n_angles


@pytest.mark.skipif(not os.path.exists(REF_HOOKS),
                    reason="reference examples not present")
def test_reference_hooks_file_loads():
    from chemlab_tpu.start_simulation import _load_hooks

    hooks = _load_hooks(REF_HOOKS)
    assert "hook_init_reaction" in hooks
    import inspect
    assert len(inspect.signature(hooks["hook_init_reaction"]).parameters) == 5
