"""Medium-stack semantics tests against a straightforward python model of
the reference's add/pop/top/true-hit rules (HalgoenCompute.compute:582-665)."""

import numpy as np
import jax.numpy as jnp

from halogen_tpu.core.medium import Medium, MediumStack
from halogen_tpu.core.types import EMPTY_PRIORITY, NO_MEDIUM_ID


# --- python model of the reference stack --------------------------------
class PyStack:
    def __init__(self):
        self.items = []  # (priority, material_id, ior)

    def push(self, prio, mid, ior=1.5):
        if len(self.items) >= 8:
            return
        if not self.items or prio <= self.items[-1][0]:
            self.items.append((prio, mid, ior))
        else:
            k = sum(1 for p, *_ in self.items if p > prio)
            self.items.insert(k, (prio, mid, ior))

    def pop(self, mid):
        for i, (_, m, _) in enumerate(self.items):
            if m == mid:
                del self.items[i]
                return

    def top(self):
        return self.items[-1] if self.items else (EMPTY_PRIORITY, NO_MEDIUM_ID, 1.0)

    def true_hit(self, prio):
        return not self.items or prio <= self.items[-1][0]


def _medium(prio, mid, ior=1.5):
    return Medium(
        ior=jnp.asarray([ior], jnp.float32),
        absorption=jnp.zeros((1, 3), jnp.float32),
        priority=jnp.asarray([prio], jnp.int32),
        material_id=jnp.asarray([mid], jnp.int32),
    )


TRUE = jnp.asarray([True])


def _check(stack: MediumStack, model: PyStack):
    size = int(stack.size[0])
    assert size == len(model.items), (size, model.items)
    for i, (p, m, _) in enumerate(model.items):
        assert int(stack.priority[0, i]) == p
        assert int(stack.material_id[0, i]) == m
    top = stack.top()
    mp, mm, mi = model.top()
    assert int(top.priority[0]) == mp
    assert int(top.material_id[0]) == mm
    np.testing.assert_allclose(float(top.ior[0]), mi, rtol=1e-6)


def test_push_pop_sequences():
    ops = [
        ("push", 2, 10, 1.5),
        ("push", 1, 11, 1.3),
        ("push", 3, 12, 1.7),  # inserts at bottom
        ("push", 2, 13, 1.4),  # equal priority above existing 2
        ("pop", None, 10, None),
        ("push", 0, 14, 2.0),
        ("pop", None, 12, None),
        ("pop", None, 99, None),  # missing: no-op
        ("pop", None, 14, None),
    ]
    stack = MediumStack.create(1)
    model = PyStack()
    for op, prio, mid, ior in ops:
        if op == "push":
            stack = stack.push(_medium(prio, mid, ior), TRUE)
            model.push(prio, mid, ior)
        else:
            stack = stack.pop_id(jnp.asarray([mid], jnp.int32), TRUE)
            model.pop(mid)
        _check(stack, model)


def test_true_hit_rule():
    stack = MediumStack.create(1)
    assert bool(stack.is_true_hit(jnp.asarray([5], jnp.int32))[0])  # empty
    stack = stack.push(_medium(2, 1), TRUE)
    # lower value = higher precedence: hits with p <= 2 are true
    assert bool(stack.is_true_hit(jnp.asarray([2], jnp.int32))[0])
    assert bool(stack.is_true_hit(jnp.asarray([1], jnp.int32))[0])
    assert not bool(stack.is_true_hit(jnp.asarray([3], jnp.int32))[0])


def test_overflow_dropped():
    stack = MediumStack.create(1, depth=4)
    model_size = 0
    for i in range(6):
        stack = stack.push(_medium(1, i), TRUE)
        model_size = min(model_size + 1, 4)
    assert int(stack.size[0]) == 4


def test_masked_ops_are_noops():
    stack = MediumStack.create(2)
    med = Medium(
        ior=jnp.asarray([1.5, 1.5], jnp.float32),
        absorption=jnp.zeros((2, 3), jnp.float32),
        priority=jnp.asarray([1, 1], jnp.int32),
        material_id=jnp.asarray([7, 7], jnp.int32),
    )
    mask = jnp.asarray([True, False])
    stack = stack.push(med, mask)
    assert int(stack.size[0]) == 1
    assert int(stack.size[1]) == 0
    stack = stack.pop_id(jnp.asarray([7, 7], jnp.int32), jnp.asarray([False, True]))
    assert int(stack.size[0]) == 1  # masked off
    assert int(stack.size[1]) == 0  # nothing to pop


def test_random_fuzz_against_model():
    rng = np.random.default_rng(42)
    stack = MediumStack.create(1)
    model = PyStack()
    next_id = 0
    live = []
    for _ in range(200):
        if live and rng.random() < 0.4:
            mid = live.pop(rng.integers(len(live)))
            stack = stack.pop_id(jnp.asarray([mid], jnp.int32), TRUE)
            model.pop(mid)
        else:
            prio = int(rng.integers(0, 5))
            mid = next_id
            next_id += 1
            if len(model.items) < 8:
                live.append(mid)
            stack = stack.push(_medium(prio, mid), TRUE)
            model.push(prio, mid)
        _check(stack, model)
