#!/usr/bin/env python
"""HGR-TPU CLI — the reference's ``python main.py <flags>`` entry point
(reference ``main.py:14-70,225-270``), same flag names and defaults, plus
TPU/synthetic extras (see ``hgr_tpu/config.py``).

Examples:
  # zero-shot OM fine-tune on synthetic data (smoke):
  python main.py --synthetic True --arch TEST-RN --epochs 1 --batch_size 4 \
      --num_compare 8 --test_batch_size 8 --print_freq 5 --lr 1e-4
  # evaluation only:
  python main.py --synthetic True --arch TEST-RN --train False --test_batch_size 8
"""

from hgr_tpu.driver import main

if __name__ == "__main__":
    main()
