"""Scalar function registry."""
