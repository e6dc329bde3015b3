"""Local-mirror downloader CLI tests."""

from pathlib import Path

from happypose_tpu.scripts.download import gather_requests, main


def test_no_mirror_errors(tmp_path):
    rc = main(["--examples", "demo", "--data-dir", str(tmp_path / "d")])
    assert rc == 2


def test_missing_asset_reports(tmp_path):
    (tmp_path / "mirror").mkdir()
    rc = main([
        "--bop_dataset", "ycbv", "--mirror", str(tmp_path / "mirror"),
        "--data-dir", str(tmp_path / "d"),
    ])
    assert rc == 3


def test_symlink_and_copy(tmp_path):
    src = tmp_path / "mirror" / "examples" / "demo"
    src.mkdir(parents=True)
    (src / "f.txt").write_text("x")
    for flag, check in ((None, Path.is_symlink), ("--copy", Path.is_dir)):
        data = tmp_path / ("d_copy" if flag else "d_link")
        argv = ["--examples", "demo", "--mirror",
                str(tmp_path / "mirror"), "--data-dir", str(data)]
        if flag:
            argv.append(flag)
        assert main(argv) == 0
        dst = data / "examples" / "demo"
        assert check(dst)
        assert (dst / "f.txt").read_text() == "x"


def test_gather_requests_layout():
    class A:
        bop_dataset = ["ycbv", "tless"]
        megapose_models = True
        cosypose_models = ["run-1"]
        examples = ["barbecue-sauce"]

    reqs = gather_requests(A())
    dests = [d for _, d in reqs]
    assert "bop_datasets/ycbv" in dests
    assert "megapose-models" in dests
    assert "experiments/run-1" in dests
    assert "examples/barbecue-sauce" in dests
