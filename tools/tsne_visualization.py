"""t-SNE plot of model embeddings over a dataset.

Equivalent of reference tools/tSNE_visualization.py: embed samples with the
backbone's pooled features and scatter-plot a 2D t-SNE.

    python tools/tsne_visualization.py --cfg <exp.yaml> --platform cpu --out tsne.png
"""

from __future__ import annotations

from _common import base_parser, load_cfg, setup_platform


def main() -> None:
    p = base_parser(__doc__)
    p.add_argument("--out", default="tsne.png")
    p.add_argument("--max_samples", type=int, default=256)
    args = p.parse_args()
    setup_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from sklearn.manifold import TSNE

    from hrnet_hand_pose_estimation_tpu.data.build import make_test_dataloader
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.parallel.checkpoint import load_pretrained

    cfg = load_cfg(args)
    model = build_model(cfg)
    loaders = make_test_dataloader(cfg)
    name, loader = next(iter(loaders.items()))

    sample = next(iter(loader))
    if args.model_path:
        variables = load_pretrained(args.model_path)
    else:
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.key(0), jnp.asarray(sample["imgs"][:1]), False)

    @jax.jit
    def embed(v, x):
        out = model.apply(v, x, False)
        return jnp.mean(out.features.astype(jnp.float32), axis=(1, 2))

    feats = []
    n = 0
    for batch in loader:
        feats.append(np.asarray(embed(variables, jnp.asarray(batch["imgs"]))))
        n += feats[-1].shape[0]
        if n >= args.max_samples:
            break
    emb = np.concatenate(feats)[: args.max_samples]
    pts = TSNE(n_components=2, init="pca", perplexity=min(30, len(emb) - 1)).fit_transform(emb)
    plt.figure(figsize=(6, 6))
    plt.scatter(pts[:, 0], pts[:, 1], s=8, c=np.arange(len(pts)), cmap="viridis")
    plt.title(f"t-SNE of {name} embeddings ({len(pts)} samples)")
    plt.tight_layout()
    plt.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
