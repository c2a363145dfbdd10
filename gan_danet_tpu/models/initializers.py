"""Weight-init schemes matching `weights_init_normal`
(reference models/utils.py:7-21): Kaiming-normal (fan_in, relu gain) for
convs, Xavier-normal for dense layers, zero biases, BN gamma=1/beta=0
(the flax defaults)."""
from __future__ import annotations

from flax import linen as nn

# torch kaiming_normal_(mode='fan_in', nonlinearity='relu'): N(0, 2/fan_in)
kaiming_conv_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

# torch xavier_normal_: N(0, 2/(fan_in+fan_out))
xavier_linear_init = nn.initializers.variance_scaling(1.0, "fan_avg", "normal")
