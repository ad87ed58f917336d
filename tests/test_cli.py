"""CLI-level end-to-end tests for the flagship config-3 path: the
device-diagnostics flow (_TeeDeviceBackend + one-program ESS/R-hat/
predictive) and --chain-shards wiring, on real bundled pixels (sklearn
digits).  Heavier than unit tests — gated behind the 8-device mesh suite."""

import json

import pytest

from tests.conftest import requires_multidevice


def _run_cli(capsys, argv):
    from dropout_hamiltonian_montecarlo_tpu import cli

    cli.main(argv)
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
             if ln.startswith("{")]
    return json.loads(lines[-1])


@requires_multidevice
def test_cli_mnist_nuts_device_diag(capsys):
    j = _run_cli(capsys, [
        "mnist-nuts", "--dataset", "digits", "--chains", "16",
        "--samples", "20", "--warmup", "20"])
    assert j["sampler"] == "batched-nuts"
    assert j["chain_shards"] == 1
    assert "diag_s" in j                       # on-device diagnostics ran
    assert j["min_ess"] > 0
    assert j["max_rhat"] < 2.0
    assert j["train_accuracy"] > 0.9           # Newton MAP mode quality
    assert j["dataset"] == "sklearn-digits"


@requires_multidevice
def test_cli_mnist_nuts_chain_shards(capsys):
    j = _run_cli(capsys, [
        "mnist-nuts", "--dataset", "digits", "--chains", "16",
        "--samples", "20", "--warmup", "20", "--chain-shards", "8"])
    assert j["chain_shards"] == 8
    assert j["min_ess"] > 0
    assert j["train_accuracy"] > 0.9


@requires_multidevice
def test_cli_chain_shards_must_divide(capsys):
    with pytest.raises(SystemExit):
        _run_cli(capsys, [
            "mnist-nuts", "--dataset", "digits", "--chains", "15",
            "--samples", "10", "--warmup", "10", "--chain-shards", "8"])
