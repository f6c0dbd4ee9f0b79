"""Distributed selfplay: an HTTP task/model/data bus.

The role of the reference's volunteer-compute pair — the HTTPS client
(`cpp/distributed/client.{h,cpp}`, driven by `cpp/command/contribute.cpp`)
and the training server it talks to (SURVEY.md §2.8 P7). Kept deliberately
small: stdlib HTTP, JSON + npz bodies, writing into the same base-dir layout
the local loop uses, so contributed data flows into shuffle/train unchanged.
"""

from katacoffee_tpu.distributed.server import ContributionServer
from katacoffee_tpu.distributed.client import ContributeClient

__all__ = ["ContributionServer", "ContributeClient"]
