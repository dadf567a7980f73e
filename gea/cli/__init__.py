"""CLI entry points mirroring the reference scripts (SURVEY.md §1 L4/L5):

==============================  =====================================
reference                       here
==============================  =====================================
``g_lis/train.py``              ``python -m gea.cli.train_glis``
``g_lis/sample.py``             ``python -m gea.cli.sample``
``g_lis/sample_interpolations`` ``python -m gea.cli.sample_interpolations``
``r_separate/train_r.py``       ``python -m gea.cli.train_r_separate``
``r_separate`` sampler          ``python -m gea.cli.sample_r_separate``
``r_iterative/train.py``        ``python -m gea.cli.train_r_iterative``
``r_iterative/sample.py``       ``python -m gea.cli.sample_r_iterative``
==============================  =====================================
"""
