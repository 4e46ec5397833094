"""Guard: every train() keyword must be threaded through the __main__
argparse call. Catches the parsed-but-never-passed class of bug (a flag
that argparse accepts while train() silently runs its default — happened
with --aux-loss; this test greps the __main__ call site for each
parameter)."""

import inspect
import os.path as osp


def test_train_main_threads_every_parameter():
    import train as train_cli

    sig = inspect.signature(train_cli.train)
    src = open(osp.join(osp.dirname(train_cli.__file__),
                        "train.py")).read()
    main_block = src.split("if __name__")[1]
    for p in sig.parameters:
        if p in ("data_dir", "model_name"):
            continue  # positional / renamed (data=opt.data, model=opt.model)
        assert f"{p}=opt." in main_block, (
            f"train() parameter {p!r} is not passed from the __main__ "
            f"argparse call — the flag parses but does nothing")
