"""Shared jit helpers for the fast test tier (VERDICT r4 item 5).

Eager ``flax`` ``Module.init`` dispatches thousands of tiny ops one by one
— measured 15.6 s for the tiny teacher on this 1-core host vs 6.3 s for a
single jitted program (and ~0 s on a same-signature cache hit). The same
applies to ``jax.grad`` of an un-jitted apply. These helpers keep ONE jit
wrapper per module class so repeated inits of the same config+shapes
across tests in a module hit the compile cache instead of re-tracing.
"""
import jax

_JIT_INITS: dict = {}


def jit_init(module, *args, **kwargs):
    """``module.init(*args, **kwargs)`` as a compiled program, cached per
    module CLASS (the module instance itself is a static argument, so
    different configs of one class coexist in the same cache)."""
    fn = _JIT_INITS.get(type(module))
    if fn is None:
        fn = jax.jit(type(module).init, static_argnums=0)
        _JIT_INITS[type(module)] = fn
    return fn(module, *args, **kwargs)


def jit_grad(loss_fn, params):
    """One-shot compiled gradient (for grad-flow asserts on tiny models)."""
    return jax.jit(jax.grad(loss_fn))(params)


_JIT_APPLIES: dict = {}


def jit_apply(module, *args, **kwargs):
    """``module.apply(*args, **kwargs)`` as a compiled program.

    The FIRST eager apply after a jitted init pays hundreds of tiny
    per-primitive compile-cache misses (measured 8.8 s for the tiny
    single-mode teacher vs ~2 s for one fused jit compile). Hashable
    kwargs (``return_attn=True`` etc.) are treated as static; pass
    ``mutable``/collection kwargs as tuples."""
    static_names = tuple(sorted(
        k for k, v in kwargs.items()
        if isinstance(v, (bool, str, int, float, tuple, type(None)))))
    key = (type(module), static_names)
    fn = _JIT_APPLIES.get(key)
    if fn is None:
        fn = jax.jit(type(module).apply, static_argnums=0,
                     static_argnames=static_names)
        _JIT_APPLIES[key] = fn
    return fn(module, *args, **kwargs)
