"""Generate notebook ports of the examples/*.py scripts.

The reference ships its examples as notebooks (/root/reference/examples/*.ipynb);
this repo's canonical examples are .py scripts (smoke-tested in CI).  This
script derives the notebook form: a markdown cell from the module docstring,
a code cell with the script body, and a final cell invoking main().

Run:  python scripts/make_notebooks.py
"""

import ast
import pathlib

import nbformat as nbf

ROOT = pathlib.Path(__file__).resolve().parents[1]
EXAMPLES = ROOT / "examples"
OUT = EXAMPLES / "notebooks"


def convert(path: pathlib.Path) -> None:
    src = path.read_text()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or path.stem
    lines = src.splitlines()

    # strip the module docstring and the __main__ guard
    body_start = tree.body[1].lineno - 1 if (
        tree.body and isinstance(tree.body[0], ast.Expr)
    ) else 0
    guard = next(
        (node.lineno - 1 for node in tree.body
         if isinstance(node, ast.If) and getattr(node.test.left, "id", "") == "__name__"),
        len(lines),
    )
    body = "\n".join(lines[body_start:guard]).strip()

    nb = nbf.v4.new_notebook()
    title = path.stem.replace("_", " ")
    nb.cells = [
        nbf.v4.new_markdown_cell(f"# {title}\n\n{doc}"),
        nbf.v4.new_code_cell(body),
        nbf.v4.new_code_cell("result = main()\nprint('done:', result)"),
    ]
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    out = OUT / f"{path.stem}.ipynb"
    nbf.write(nb, str(out))
    print("wrote", out.relative_to(ROOT))


if __name__ == "__main__":
    OUT.mkdir(exist_ok=True)
    for p in sorted(EXAMPLES.glob("*.py")):
        convert(p)
