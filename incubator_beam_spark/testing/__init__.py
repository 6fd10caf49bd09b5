"""Test utilities mirroring the reference's assert_that/equal_to harness."""

from .util import assert_that, equal_to, is_empty  # noqa: F401
