"""Cluster-deployment glue: SSH machine-list parsing and HTCondor
submit-description generation (reference: nabu/computing/{static,condor}).
No real cluster: condor_submit/condor_rm are exercised via stub
executables on PATH."""

import os
import stat

from nabu_tpu.computing import condor, ssh_cluster


def test_read_cluster_file(tmp_path):
    p = tmp_path / "cluster"
    p.write_text("# head node\nhost-a\n\nhost-b\n  host-c  \n")
    assert ssh_cluster.read_cluster_file(str(p)) == [
        "host-a", "host-b", "host-c",
    ]


def test_condor_submit_files(tmp_path):
    expdir = str(tmp_path / "exp")
    os.makedirs(expdir)
    files = condor.write_submit_files(
        expdir, recipe="/r/recipe", repo_dir="/repo", num_processes=3,
        coordinator="head:29500", request_cpus=8, request_memory="16G",
        requirements='(Machine != "badnode")', extra_args="--profile",
    )
    assert len(files) == 3
    text = open(files[1]).read()
    assert "--process_id=1" in text
    assert "--num_processes=3" in text
    assert "--coordinator=head:29500" in text
    assert "executable = /repo/run" in text
    assert "request_cpus = 8" in text
    assert 'requirements = (Machine != "badnode")' in text
    assert "--profile" in text
    # every rank present exactly once
    ranks = {open(f).read().split("--process_id=")[1].split()[0]
             for f in files}
    assert ranks == {"0", "1", "2"}


def test_condor_launch_dry_run_and_remove(tmp_path, monkeypatch):
    expdir = str(tmp_path / "exp")
    os.makedirs(expdir)
    jobids = condor.launch(
        expdir, recipe="/r", repo_dir="/repo", num_processes=2,
        coordinator_host="head", dry_run=True,
    )
    assert jobids == []
    assert os.path.exists(os.path.join(expdir, "condor", "proc_0.job"))

    # stub condor_submit / condor_rm on PATH
    bindir = tmp_path / "bin"
    bindir.mkdir()
    submit = bindir / "condor_submit"
    submit.write_text(
        "#!/bin/sh\necho '1 job(s) submitted to cluster 4'\n"
    )
    rm = bindir / "condor_rm"
    rm.write_text(f"#!/bin/sh\necho \"$@\" > {tmp_path}/rm_args\n")
    for script in (submit, rm):
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    files = [os.path.join(expdir, "condor", f"proc_{r}.job")
             for r in range(2)]
    jobids = condor.submit(files, expdir)
    assert jobids == ["4", "4"]
    assert os.path.exists(os.path.join(expdir, "condor", "jobids"))

    condor.remove(expdir)
    assert open(tmp_path / "rm_args").read().split() == ["4", "4"]
    assert not os.path.exists(os.path.join(expdir, "condor", "jobids"))
