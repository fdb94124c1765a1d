"""Multirun sweep entry (scripts/sweep.py): grid/random trial expansion +
an end-to-end 2-trial grid run (reference: hydra -m multirun + the optuna
sweeper yaml, configs/hparams_search/)."""
import runpy
import sys
from pathlib import Path

import pytest

_SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "sweep.py"
_ns = runpy.run_path(str(_SCRIPT), run_name="_sweep_module")


def test_split_grid_respects_brackets():
    split = _ns["_split_grid"]
    assert split("1e-4,4e-4") == ["1e-4", "4e-4"]
    assert split("[1,4,4]") == ["[1,4,4]"]
    assert split("[1,4,4],[2,8,8]") == ["[1,4,4]", "[2,8,8]"]


def test_grid_trials_cartesian_product():
    trials = list(_ns["_grid_trials"](
        ["a=1,2", "b=x", "c=3,4"]))
    assert len(trials) == 4
    assert ["b=x", "a=1", "c=3"] in trials
    assert ["b=x", "a=2", "c=4"] in trials


def test_random_trials_ranges_and_log():
    trials = list(_ns["_random_trials"](
        ["lr=1e-5:1e-2:log", "fixed=7", "w=0:1"], 16, seed=0))
    assert len(trials) == 16
    for t in trials:
        d = dict(kv.split("=") for kv in t)
        assert d["fixed"] == "7"
        assert 1e-5 <= float(d["lr"]) <= 1e-2
        assert 0.0 <= float(d["w"]) <= 1.0
    # log-uniform actually spreads across decades
    lrs = [float(dict(kv.split("=") for kv in t)["lr"]) for t in trials]
    assert max(lrs) / min(lrs) > 10


def test_tpe_space_parse():
    fixed, specs = _ns["_parse_tpe_space"](
        ["lr=1e-5:1e-2:log", "bs=16,32", "datamodule=synthetic", "w=0:1"])
    assert fixed == ["datamodule=synthetic"]
    d = dict((k, (kind, data)) for k, kind, data in specs)
    assert d["lr"] == ("num", (1e-5, 1e-2, True))
    assert d["w"] == ("num", (0.0, 1.0, False))
    assert d["bs"] == ("cat", ["16", "32"])


def test_tpe_converges_on_quadratic():
    """Deterministic (seeded): TPE beats its own startup phase and lands
    near the optimum of f(x) = (x - 0.7)^2 within 40 trials."""
    tpe = _ns["_TPESampler"]([("x", "num", (0.0, 1.0, False))], seed=0)
    for _ in range(40):
        p = tpe.suggest()
        tpe.tell(p, (p["x"] - 0.7) ** 2)
    xs = [h[1]["x"] for h in tpe.history]
    assert min(h[0] for h in tpe.history) < 1e-3
    # exploitation: late suggestions cluster near the optimum vs startup
    early = sum(abs(x - 0.7) for x in xs[:10])
    late = sum(abs(x - 0.7) for x in xs[-10:])
    assert late < early / 2


def test_tpe_log_and_categorical():
    """Log-scale numeric + categorical: best lr spans decades correctly
    and the good category dominates late suggestions."""
    specs = [("lr", "num", (1e-5, 1e-1, True)),
             ("opt", "cat", ["good", "bad"])]
    tpe = _ns["_TPESampler"](specs, seed=1)
    for _ in range(40):
        p = tpe.suggest()
        loss = abs(__import__("math").log10(p["lr"]) + 3)  # optimum 1e-3
        loss += 0.0 if p["opt"] == "good" else 1.0
        tpe.tell(p, loss)
    late = tpe.history[-10:]
    assert sum(1 for h in late if h[1]["opt"] == "good") >= 7
    best_lr = min(tpe.history, key=lambda h: h[0])[1]["lr"]
    assert 2e-4 < best_lr < 5e-3


@pytest.mark.slow  # two tiny fits (~20s warm); helpers above stay fast
@pytest.mark.filterwarnings("ignore")
def test_sweep_end_to_end_two_trials(tmp_path, monkeypatch, capsys):
    """Grid over seed only — two full (tiny) train tasks, no recompiles —
    and the best-trial line reports the minimizing trial."""
    monkeypatch.setenv("PROJECT_ROOT", str(tmp_path))
    tiny = [
        "datamodule=synthetic", "batch_size=8", "datamodule.resolution=16",
        "datamodule.sequence_length=2", "datamodule.num_train=16",
        "datamodule.num_val=8", "trainer.max_epochs=1",
        "model.generator.n_codes=16", "model.generator.n_hiddens=16",
        "model.generator.n_res_layers=1",
        "model.generator.downsample=[1,4,4]",
        "model.generator.embedding_dim=8",
        "model.generator.kernel_mode=xla", "model.do_evaluation=false",
    ]
    monkeypatch.setattr(sys, "argv", ["sweep.py", *tiny, "seed=0,1"])
    runpy.run_path(str(_SCRIPT), run_name="__main__")
    out = capsys.readouterr().out
    assert "best trial" in out
    assert "total/val=" in out
