"""GP object: process/element DAG and posterior inference."""

from ._gp import GP, DefaultProcess
from ._streaming import stream_marginal_likelihood, stream_pred
