"""Symbol-level API-parity guard against the reference tree.

A user of the reference switches by pointing their imports at this
repo's compatibility shims (``framework/``, ``framework_extended/``,
``util/``).  These tests make that contract checkable: every PUBLIC
top-level name (function / class / constant) and every public method of
the main classes in the reference modules must be importable from the
same module path here.  The reference source is PARSED (ast), never
imported — it needs numba/sklearn versions this environment doesn't
ship — so the guard runs wherever ``/root/reference`` is mounted and
skips cleanly elsewhere.
"""

import ast
import importlib
import os

import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT),
    reason="reference tree not mounted",
)

MODULES = [
    "framework.marginalizable_state_space_model",
    "framework.marginalizable_mixture_model",
    "framework_extended.state_space_model",
    "framework_extended.state_space_model_classifier",
    "framework_extended.state_space_model_knn",
    "framework_extended.state_space_model_linear_gaussian",
    "framework_extended.state_space_model_linear_trans_knn_meas",
    "framework_extended.state_space_model_mixture",
    "util.util_state_space",
    "util.util_adni",
    "util.util_macc",
    "util.util_post_hoc",
]

CLASSES = [
    ("framework.marginalizable_mixture_model", "MMLinGaussSS_marginalizable"),
    ("framework_extended.state_space_model_mixture", "StateSpaceMixtureModel"),
    ("framework_extended.state_space_model", "StateSpaceModel"),
    (
        "framework_extended.state_space_model_classifier",
        "StateSpaceModelClassifier",
    ),
    ("framework_extended.state_space_model_knn", "StateSpaceKNN"),
    (
        "framework_extended.state_space_model_linear_gaussian",
        "StateSpaceLinearGaussian",
    ),
    (
        "framework_extended.state_space_model_linear_trans_knn_meas",
        "StateSpaceHybrid",
    ),
]


def _ref_path(module: str) -> str:
    return os.path.join(REF_ROOT, *module.split(".")) + ".py"


def _ref_tree(module: str) -> ast.Module:
    with open(_ref_path(module)) as fh:
        return ast.parse(fh.read())


def _public_toplevel_names(tree: ast.Module) -> set:
    names = set()
    for node in tree.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            names.add(node.name)
        elif isinstance(node, ast.Assign):
            names.update(
                t.id for t in node.targets if isinstance(t, ast.Name)
            )
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            names.add(node.target.id)
    return {n for n in names if not n.startswith("_")}


@pytest.mark.parametrize("module", MODULES)
def test_every_public_reference_symbol_importable(module):
    ref_names = _public_toplevel_names(_ref_tree(module))
    ours = importlib.import_module(module)
    missing = sorted(n for n in ref_names if not hasattr(ours, n))
    assert not missing, (
        f"{module} lacks reference public symbols: {missing}"
    )


@pytest.mark.parametrize("module,cls", CLASSES)
def test_every_public_reference_method_present(module, cls):
    tree = _ref_tree(module)
    ref_methods = None
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == cls:
            ref_methods = sorted(
                n.name
                for n in node.body
                if isinstance(n, ast.FunctionDef)
                and not n.name.startswith("_")
            )
    assert ref_methods is not None, f"{cls} not found in reference {module}"
    ours = getattr(importlib.import_module(module), cls)
    missing = [n for n in ref_methods if not hasattr(ours, n)]
    assert not missing, f"{module}.{cls} lacks methods: {missing}"


def test_every_reference_driver_and_posthoc_script_present():
    """Each runnable experiment / posthoc script at the reference root
    (or posthoc/) has a same-named Python counterpart here (R scripts
    map to .py — the in-repo stats implementations)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for sub, ours_sub in [(".", "drivers"), ("posthoc", "posthoc")]:
        refdir = os.path.join(REF_ROOT, sub)
        for fn in os.listdir(refdir):
            base, ext = os.path.splitext(fn)
            if ext not in (".py", ".R") or base == "__init__":
                continue
            if not os.path.isfile(os.path.join(refdir, fn)):
                continue
            ours = os.path.join(repo, ours_sub, base + ".py")
            assert os.path.isfile(ours), f"no counterpart for {sub}/{fn}"
