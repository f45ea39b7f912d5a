"""Gradio front-ends for the three promptable pipelines.

TPU-native rebuilds of the reference apps:
* MNIST chat app (`mnist/gr.py`): LLM-driven chat that shows digits with a
  numbered patch grid and applies user-directed patch transformations;
* house app (`house_sales_kc_usa/gradio_app.py`): sample browser + natural-
  language feature-mask parsing + counterfactual diff table (the reference's
  KeyError on `abs_delta`/`orig`/`cf` columns — SURVEY.md section 2.11 — is
  fixed by constructing the table from one source of truth);
* moons app (`moons/gradio_app.py`): mask-policy radio + decision-boundary
  CF arrow plot.

gradio is an optional dependency: each `build_*_app` raises a clear error
when it is missing, and ALL decision logic lives in the UI-independent
backend classes (`MnistChatBackend`, `HouseBackend`, `MoonsBackend`) plus
`cfgan.serve.engine` / `cfgan.serve.intent`, so everything stays
unit-testable without a UI — the gradio builders are thin bindings.  LLM
chat uses `cfgan.serve.intent.llm_client()` (env-keyed; regex fallback
otherwise).
"""
from __future__ import annotations

import os
import tempfile

import numpy as np

from cfgan.serve import intent
from cfgan.serve.engine import CounterfactualEngine

MNIST_SYSTEM_PROMPT = """You are an assistant for a counterfactual-digit \
demo. The user can ask to see a digit or transform a displayed digit into \
another class by modifying only certain patches (numbered 0-15, row-major \
over a 4x4 grid of 7x7 patches). When the user asks to see a digit, append \
a hidden action comment: <!-- {"action": "show_digit", "value": D} -->. \
When the user asks for a transformation, append: \
<!-- {"action": "transform_digit", "target": T, "patches": [..]} -->. \
Reply conversationally; the comment must be valid JSON."""


def _require_gradio():
    try:
        import gradio as gr

        return gr
    except ImportError as e:  # pragma: no cover - environment dependent
        raise ImportError(
            "gradio is not installed; the cfgan serve apps need it. "
            "The serving engine (cfgan.serve.engine) works without it."
        ) from e


def _tmp_png() -> str:
    fd, path = tempfile.mkstemp(suffix=".png", prefix="cfgan_")
    os.close(fd)
    return path


# ------------------------------------------------------------------- MNIST
class MnistChatBackend:
    """UI-independent state machine behind the MNIST chat app
    (`mnist/gr.py:68-231`).

    Single-session object: carries conversation state (`current_idx`) and
    a `np.random.RandomState` — create one per user session; only the
    shared `engine` underneath is thread-safe (see `serve/engine.py`).
    The same ownership rule applies to `HouseBackend` / `MoonsBackend`."""

    def __init__(self, engine: CounterfactualEngine, x_test, y_test,
                 patch_size: int = 7, llm=None, seed: int = 0):
        self.engine = engine
        self.x = np.asarray(x_test)
        self.y = np.asarray(y_test)
        self.patch_size = patch_size
        self.rng = np.random.RandomState(seed)
        # llm=None -> autodetect provider; llm=False -> force the
        # deterministic regex parser
        self.llm = intent.llm_client() if llm is None else (llm or None)
        self.current_idx: int | None = None
        # digit index over the test set (`mnist/gr.py:87-90`)
        self.by_digit = {d: np.nonzero(self.y == d)[0]
                         for d in range(engine.num_classes)}
        h = self.x.shape[1]
        self.n_patches = (h // patch_size) ** 2

    def reply(self, message: str, history: list[tuple[str, str]]):
        """Returns (assistant_text, image_path | None)."""
        if self.llm:
            transcript = "".join(
                f"\nUser: {u}\nAssistant: {a}" for u, a in history
            )
            raw = self.llm(
                f"{MNIST_SYSTEM_PROMPT}{transcript}\nUser: {message}\n"
                "Assistant:"
            )
        else:
            raw = self._deterministic_reply(message)
        action = intent.extract_action(raw, self.engine.num_classes,
                                       self.n_patches)
        text = intent.strip_action(raw)
        img = None
        if action and action["action"] == "show_digit":
            img = self.show_digit(action["value"])
        elif action and action["action"] == "transform_digit":
            img, ok, pred, conf = self.transform(action["target"],
                                                 action["patches"])
            text += (f"\n\nResult: classifier says {pred} "
                     f"({conf:.2f} confidence) — "
                     + ("flip succeeded." if ok else "no flip."))
        return text, img

    def _deterministic_reply(self, message: str) -> str:
        """Regex fallback when no LLM provider is configured."""
        import re

        m = re.search(r"show\D*(\d)", message.lower())
        if m:
            return (f"Here is a {m.group(1)}. "
                    f'<!-- {{"action": "show_digit", "value": {m.group(1)}}} -->')
        m = re.search(
            r"(?:transform|turn|make|change).*?(?:into|to)\D*(\d).*?"
            r"patch(?:es)?\s*([\d,\s]+)", message.lower(), re.DOTALL,
        )
        if m:
            patches = [int(p) for p in m.group(2).replace(",", " ").split()]
            return ('Transforming. <!-- {"action": "transform_digit", '
                    f'"target": {m.group(1)}, "patches": {patches}}} -->')
        return ("I can 'show digit D' or 'transform it into T using "
                "patches i, j, ...'.")

    def show_digit(self, digit: int) -> str:
        from cfgan.eval.images import patch_grid_overlay

        pool = self.by_digit.get(digit)
        if pool is None or len(pool) == 0:
            raise ValueError(f"no test samples of digit {digit}")
        self.current_idx = int(self.rng.choice(pool))
        path = _tmp_png()
        patch_grid_overlay(self.x[self.current_idx], self.patch_size, path)
        return path

    def transform(self, target: int, patches: list[int]):
        from cfgan.eval.images import user_modification_example

        if self.current_idx is None:
            self.current_idx = int(self.rng.randint(len(self.y)))
        path = _tmp_png()
        res = user_modification_example(
            self.engine.cf_fn, self.engine.clf_fn, self.engine.g_vars,
            self.x[self.current_idx], target, patches, self.patch_size,
            path=path,
        )
        return path, bool(res["pred"] == target), res["pred"], res["confidence"]


def build_mnist_app(engine, x_test, y_test, patch_size: int = 7):
    gr = _require_gradio()
    backend = MnistChatBackend(engine, x_test, y_test, patch_size)

    with gr.Blocks(title="Promptable MNIST counterfactuals") as demo:
        gr.Markdown("# Promptable MNIST counterfactuals\n"
                    "Ask to *show* a digit, then *transform* it using "
                    "specific patches.")
        chat = gr.Chatbot(height=380)
        img = gr.Image(label="Current digit / result", type="filepath")
        box = gr.Textbox(label="Message")

        def respond(message, history):
            history = history or []
            text, image = backend.reply(message, history)
            history = history + [(message, text)]
            return history, image, ""

        box.submit(respond, [box, chat], [chat, img, box])
    return demo


# ------------------------------------------------------------------- house
class HouseBackend:
    """UI-independent logic behind the house app
    (`house_sales_kc_usa/gradio_app.py:51-217`), mirroring the
    MnistChatBackend pattern so it stays unit-testable without gradio."""

    def __init__(self, engine: CounterfactualEngine, x_test, y_test, schema,
                 stats, bins=None, seed: int = 0):
        self.engine = engine
        self.x = np.asarray(x_test)
        self.y = np.asarray(y_test)
        self.schema = schema
        self.stats = stats
        self.bins = bins
        self.rng = np.random.RandomState(seed)
        self.current_idx = 0

    def class_overview(self) -> str:
        """Price-bin ranges (`house gradio_app.py:51-54`)."""
        if self.bins is None:
            return "4 price quartile classes (Q0 cheapest .. Q3 priciest)."
        lines = [f"- class {i}: ${lo:,.0f} – ${hi:,.0f}"
                 for i, (lo, hi) in enumerate(zip(self.bins[:-1],
                                                  self.bins[1:]))]
        return "Price classes:\n" + "\n".join(lines)

    def show_sample(self, source_class: int):
        """Random sample of a source class: denormalized feature table +
        classifier probs (`house gradio_app.py:57-141`)."""
        pool = np.nonzero(self.y == int(source_class))[0]
        if len(pool) == 0:
            raise ValueError(f"no test samples of class {source_class}")
        self.current_idx = int(self.rng.choice(pool))
        x = self.x[self.current_idx]
        raw = np.asarray(self.stats.inverse_transform(x))
        probs = self.engine.classify(x)[0]
        import pandas as pd

        table = pd.DataFrame({"feature": self.schema.feature_names,
                              "value": raw})
        prob_txt = " | ".join(f"Q{i}: {p:.2f}" for i, p in enumerate(probs))
        return table, f"Classifier: {prob_txt}"

    def generate(self, target_class: int, instruction: str):
        """NL instruction -> allowed-feature mask -> CF diff table
        (`house gradio_app.py:150-217`; the reference's KeyError on
        `abs_delta`/`orig`/`cf` columns is fixed by building the table from
        one source of truth)."""
        allowed = intent.parse_feature_instruction_llm(instruction or "",
                                                       self.schema)
        if not allowed:
            allowed = [f for f in self.schema.feature_names
                       if f not in self.schema.immutable_features]
        x = self.x[self.current_idx][None]
        mask = self.engine.mask_from_feature_names(allowed, 1)
        res = self.engine.generate(x, int(target_class), mask)
        orig_raw = np.asarray(self.stats.inverse_transform(x[0]))
        cf_raw = np.asarray(self.stats.inverse_transform(res.x_cf[0]))
        import pandas as pd

        df = pd.DataFrame({
            "feature": self.schema.feature_names,
            "original": orig_raw,
            "counterfactual": cf_raw,
            "change": cf_raw - orig_raw,
        })
        df["abs_delta"] = np.abs(res.x_cf[0] - x[0])
        df = df.sort_values("abs_delta", ascending=False)
        verdict = (f"prediction {res.pred[0]} at {res.confidence[0]:.2f}; "
                   f"allowed features: {', '.join(allowed)}")
        return df, verdict


def build_house_app(engine, x_test, y_test, schema, stats, bins=None):
    gr = _require_gradio()
    backend = HouseBackend(engine, x_test, y_test, schema, stats, bins)

    with gr.Blocks(title="House price counterfactuals") as demo:
        gr.Markdown("# Promptable housing counterfactuals\n"
                    + backend.class_overview())
        src = gr.Dropdown([0, 1, 2, 3], value=0, label="Source class")
        show = gr.Button("Show random sample")
        table = gr.Dataframe(label="Sample")
        probs = gr.Markdown()
        instr = gr.Textbox(label="What may change? (natural language)")
        tgt = gr.Dropdown([0, 1, 2, 3], value=3, label="Target class")
        go = gr.Button("Generate counterfactual")
        diff = gr.Dataframe(label="Counterfactual diff")
        verdict = gr.Markdown()
        show.click(backend.show_sample, [src], [table, probs])
        go.click(backend.generate, [tgt, instr], [diff, verdict])
    return demo


# ------------------------------------------------------------------- moons
class MoonsBackend:
    """UI-independent logic behind the moons app
    (`moons/gradio_app.py:33-121`)."""

    MASK_ROWS = {"both": (1.0, 1.0), "x_only": (1.0, 0.0),
                 "y_only": (0.0, 1.0), "none": (0.0, 0.0)}

    def __init__(self, engine: CounterfactualEngine, clf_fn, x_test, y_test,
                 seed: int = 0):
        self.engine = engine
        self.clf_fn = clf_fn
        self.x = np.asarray(x_test)
        self.y = np.asarray(y_test)
        self.rng = np.random.RandomState(seed)
        self.current_idx = 0

    def show_sample(self, source_class: int) -> str:
        """Random sample + decision-boundary plot; returns the PNG path
        (`moons/gradio_app.py:45-75`)."""
        pool = np.nonzero(self.y == int(source_class))[0]
        if len(pool) == 0:
            raise ValueError(f"no test samples of class {source_class}")
        self.current_idx = int(self.rng.choice(pool))
        from cfgan.eval.boundaries import plot_decision_boundaries_only

        path = _tmp_png()
        plot_decision_boundaries_only(
            self.clf_fn, self.x, self.y, path,
            num_classes=self.engine.num_classes,
            highlight=self.x[self.current_idx],
        )
        return path

    def generate(self, target_class: int, mask_choice: str):
        """CF for the current sample under a mask policy; returns
        (arrow-plot path, result, verdict) (`moons/gradio_app.py:79-121`)."""
        x = self.x[self.current_idx][None]
        mask = np.broadcast_to(
            np.asarray(self.MASK_ROWS[mask_choice], np.float32), (1, 2)
        )
        res = self.engine.generate(x, int(target_class), mask)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        path = _tmp_png()
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.scatter(self.x[:, 0], self.x[:, 1], c=self.y, s=6, alpha=0.3)
        ax.annotate("", xy=res.x_cf[0], xytext=x[0],
                    arrowprops=dict(arrowstyle="->", color="red", lw=2))
        ax.set_title(f"pred {res.pred[0]} ({res.confidence[0]:.2f})")
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path, res, ("flip succeeded" if res.flipped[0] else "no flip")


def build_moons_app(engine, clf_fn, x_test, y_test):
    gr = _require_gradio()
    backend = MoonsBackend(engine, clf_fn, x_test, y_test)

    def generate_ui(target_class, mask_choice):
        path, _, verdict = backend.generate(target_class, mask_choice)
        return path, verdict

    with gr.Blocks(title="Moons counterfactuals") as demo:
        gr.Markdown("# Moons counterfactuals")
        src = gr.Dropdown([0, 1, 2], value=0, label="Source class")
        show = gr.Button("Show random sample")
        img = gr.Image(type="filepath")
        mask = gr.Radio(list(MoonsBackend.MASK_ROWS), value="both",
                        label="Modifiable dims")
        tgt = gr.Dropdown([0, 1, 2], value=1, label="Target class")
        go = gr.Button("Generate")
        out = gr.Image(type="filepath")
        msg = gr.Markdown()
        show.click(backend.show_sample, [src], [img])
        go.click(generate_ui, [tgt, mask], [out, msg])
    return demo
