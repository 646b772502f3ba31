"""GP object: process/element DAG and posterior inference."""

from ._gp import GP, DefaultProcess
