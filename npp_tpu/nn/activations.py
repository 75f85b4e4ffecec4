"""Activation functions (reference: models/activations.py:9-48).

Only functional forms — no module state. The reference's LearnedSnake /
SimpleMLP / ResNet/RNN variants are dead code there and intentionally omitted
(SURVEY.md §2.4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def snake(x: jnp.ndarray, a: float = 1.0) -> jnp.ndarray:
    """x + sin^2(a x)/a (reference: models/activations.py:29-35)."""
    return x + jnp.square(jnp.sin(a * x)) / a


def sin_act(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sin(x)


def sin_plus_cos(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sin(x) + jnp.cos(x)


def x_plus_sin(x: jnp.ndarray) -> jnp.ndarray:
    return x + jnp.sin(x)


_ACTIVATIONS = {
    'snake': snake,
    'relu': jax.nn.relu,
    'sin': sin_act,
    'sin_plus_cos': sin_plus_cos,
    'x_sin': x_plus_sin,
    'tanh': jnp.tanh,
}


def get_activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f'Unknown activation: {name}') from None
