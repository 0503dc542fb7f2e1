"""2-process multi-host run (jax.distributed over CPU) == 1-process run.

Replaces the reference's manual multi-node recipe (splitDatabase.sh +
independent processes + cat) with one SPMD job; output must be
bit-identical.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests import synth

_DRIVER = r"""
import sys
sys.path.insert(0, {repo!r})
from fastani_tpu.config import Parameters
from fastani_tpu.parallel import runner

p = Parameters(frag_len=1000)
p.window_size = 24
p.ref_sequences = {refs!r}
p.query_sequences = [{query!r}]
p.out_file_name = {out!r}
runner.run_sharded(p, coordinator={coord!r}, num_processes=2,
                   process_id=int(sys.argv[1]))
"""


@pytest.mark.slow
def test_two_process_run_matches_single(tmp_path):
    rng = np.random.default_rng(17)
    base = synth.random_genome(rng, 20_000)
    refs = []
    for i in range(4):
        path = str(tmp_path / f"r{i}.fa")
        synth.write_fasta(path, [(f"r{i}", synth.mutate_genome(
            rng, base, 0.01 + 0.02 * i))])
        refs.append(path)
    qpath = str(tmp_path / "q.fa")
    synth.write_fasta(qpath, [("q0", synth.mutate_genome(rng, base, 0.02))])

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_multi = str(tmp_path / "multi.txt")
    driver = _DRIVER.format(repo=repo, refs=refs, query=qpath,
                            out=out_multi, coord=coord)
    traces = [str(tmp_path / f"reads{i}.log") for i in range(2)]
    procs = []
    for i in range(2):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   PYTHONPATH=repo,
                   FASTANI_TRACE_READS=traces[i])
        procs.append(subprocess.Popen([sys.executable, "-c", driver, str(i)],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    # single-process truth on the same (2, 4) global mesh shape
    from fastani_tpu.config import Parameters
    from fastani_tpu.parallel import runner

    p1 = Parameters(frag_len=1000)
    p1.window_size = 24
    p1.ref_sequences = refs
    p1.query_sequences = [qpath]
    p1.out_file_name = str(tmp_path / "single.txt")
    runner.run_sharded(p1, 2, 4, log=lambda m: None)

    a = open(out_multi).read()
    b = open(p1.out_file_name).read()
    assert a == b and a.strip(), (a, b)

    # the index build is DISTRIBUTED: process 1 owns r-row 1 (files
    # j % 2 == 1) and must never have parsed the other shard's genomes
    # during its run (process 0 reads everything for the output writers)
    reads1 = set(open(traces[1]).read().split())
    assert refs[1] in reads1 and refs[3] in reads1
    assert refs[0] not in reads1 and refs[2] not in reads1
