"""Config CLI: reference flag names, defaults, and save-path convention."""

from hgr_tpu.config import Config
from hgr_tpu.models.zoo import available_models


def test_reference_defaults():
    c = Config()
    # reference defaults (main.py:14-70)
    assert c.lr == 3e-7 and c.w_lr == 1e-4 and c.epochs == 10
    assert c.num_compare == 256 and c.weights == "adaptive"
    assert c.training_method == "OM" and c.sample_strategy == "topk"
    assert c.k == 1 and c.out_ratio == 0.25 and c.in_ratio == 0.5
    assert c.weighting == "both" and c.scale == 1.0
    assert c.batch_size == 256 and c.test_batch_size == 512
    assert c.arch == "RN50" and c.load_path == "none" and c.from_epoch == -1


def test_cli_overrides_and_bools():
    c = Config.from_args(
        ["--lr", "1e-5", "--train", "False", "--fetch", "true",
         "--weights", "equal", "--out_ratio", "0.5"]
    )
    assert c.lr == 1e-5 and c.train is False and c.fetch is True
    assert c.weights == "equal" and c.out_ratio == 0.5


def test_save_path_convention():
    c = Config(folder="f", exp_name="e", weights="equal", out_ratio=0.5, in_ratio=0.25)
    # reference model/clip_tree.py:24
    assert c.save_path == "f/e/equal_0.5_0.25"


def test_zoo_names():
    names = available_models()
    for n in ["RN50", "RN101", "RN50x4", "RN50x16", "ViT-B/32", "ViT-B/16"]:
        assert n in names


def test_reference_readme_commands_parse_verbatim():
    """The reference README's exact flag styles must work unchanged — incl.
    its bare store_true booleans (`--load`, `--fetch`; reference
    main.py:64-66), alongside this CLI's explicit `--load True/False`."""
    c = Config.from_args(
        "--arch RN50 --training_method OM --weights adaptive "
        "--sample_strategy topk --lr 3e-7 --w_lr 1e-4 --out_ratio 0.25 "
        "--in_ratio 0.5 --data_train train --data_test rest "
        "--data_split_train train --data_split_test val --batch_size 256".split()
    )
    assert c.lr == 3e-7 and c.weights == "adaptive" and c.batch_size == 256

    c = Config.from_args(
        "--train False --load --load_path /tmp/m "
        "--data_split_test zsl_test --test_batch_size 512".split()
    )
    assert c.train is False and c.load is True and c.load_path == "/tmp/m"

    c = Config.from_args("--k_shots 10 --fetch --fetch_path /tmp/z".split())
    assert c.fetch is True and c.k_shots == 10

    assert Config.from_args(["--load", "False"]).load is False
