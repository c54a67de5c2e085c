"""Console entry points (installed as ``eve-train``, ``eve-inference``,
``eve-eval-codalab``, ``eve-serve``, ``eve-export`` — see pyproject.toml).

Each module mirrors one of the reference's top-level scripts
(``/root/reference/src/{train,inference,eval_codalab}.py``; serve/export
are TPU-native additions). The repo-root ``train.py`` etc. are thin shims
onto these so the reference's ``python train.py config.json`` invocation
keeps working from a source checkout.
"""
