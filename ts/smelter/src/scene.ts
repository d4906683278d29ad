/**
 * Scene-node registry: the bridge between React elements and wire-format
 * scene JSON.
 *
 * Every Smelter component is declared once with `sceneNode(tag, builder)`,
 * which (a) records the tag's wire serializer in a registry and (b) returns
 * a plain function component that renders the namespaced host element
 * `"smelter:<tag>"` carrying the component's serializable props. The
 * reconciler host in @smelter-tpu/smelter-core keeps a mutable record tree
 * of those elements and serializes it by looking builders up by tag —
 * components carry data, not closures.
 */
import { createElement } from 'react';
import type React from 'react';
import type * as Api from './api.js';

/** Font size applied to bare string children promoted into Text nodes. */
export const DEFAULT_FONT_SIZE = 50;

/** Host element namespace; anything else is rejected by the reconciler. */
export const HOST_PREFIX = 'smelter:';

export type ComponentBaseProps = {
  /** Component children. */
  children?: React.ReactNode;
  /** Id of a component. */
  id?: Api.ComponentId;
};

/** A serialized child: wire JSON, or a bare string awaiting promotion. */
export type SceneFragment = Api.Component | string;
export type SceneBuilder<P> = (props: P, children: SceneFragment[]) => Api.Component;

/** Bare strings inside a layout become Text nodes with the default size. */
export function fragmentToComponent(fragment: SceneFragment): Api.Component {
  if (typeof fragment === 'string') {
    return { type: 'text', text: fragment, font_size: DEFAULT_FONT_SIZE };
  }
  return fragment;
}

const registry = new Map<string, SceneBuilder<never>>();

/**
 * Declare a scene-node component. The returned function component renders
 * the host element; the builder is invoked later, at serialization time,
 * with the committed props and the already-serialized children.
 */
export function sceneNode<P extends ComponentBaseProps>(
  tag: string,
  builder: SceneBuilder<P>
): (props: P) => React.ReactNode {
  if (registry.has(tag)) {
    throw new Error(`scene node tag ${tag} declared twice`);
  }
  registry.set(tag, builder as SceneBuilder<never>);
  const hostType = HOST_PREFIX + tag;
  const node = (props: P) => createElement(hostType, props);
  (node as { displayName?: string }).displayName = `Smelter(${tag})`;
  return node;
}

/** Serializer lookup used by the reconciler host (smelter-core). */
export function builderFor(tag: string): SceneBuilder<object> {
  const builder = registry.get(tag);
  if (!builder) {
    throw new Error(`no scene builder registered for tag ${tag}`);
  }
  return builder as unknown as SceneBuilder<object>;
}

// ---------------------------------------------------------------------------
// Declarative wire mapping.
//
// Most components are pure prop→wire-key translations; instead of writing an
// imperative builder per component, each one is declared as a table:
// which props are read from `style`, which from the prop root, how children
// are attached, and per-field value transforms. Wire keys default to the
// snake_case of the prop name; irregular names go in `aliases`.
// ---------------------------------------------------------------------------

/** camelCase → snake_case (wire JSON convention, api/schema.py). */
export function wireKey(prop: string): string {
  return prop.replace(/[A-Z]/g, ch => '_' + ch.toLowerCase());
}

export type FieldTransform = (value: never) => unknown;

export type WireSpec = {
  /** Props copied from `props.style` (wire key = snake_case of name). */
  styleFields?: readonly string[];
  /** Props copied from the prop root. */
  rootFields?: readonly string[];
  /** prop name → wire key, where snake_case isn't it. */
  aliases?: Record<string, string>;
  /** prop name → value mapper applied before emission. */
  transforms?: Record<string, FieldTransform>;
  /**
   * How children land on the wire:
   *  - 'list'  → `children: [...]` (default)
   *  - 'one'   → `child: <only>` (throws unless exactly one)
   *  - 'join'  → `text: children joined as strings`
   *  - 'none'  → children are ignored
   */
  childSlot?: 'list' | 'one' | 'join' | 'none';
  /** Wire defaults applied when the prop is absent (post-alias keys). */
  defaults?: Record<string, unknown>;
};

function emitFields(
  out: Record<string, unknown>,
  source: Record<string, unknown> | undefined,
  fields: readonly string[],
  spec: WireSpec
): void {
  for (const name of fields) {
    const raw = source?.[name];
    if (raw === undefined || raw === null) continue;
    const mapped = spec.transforms?.[name]
      ? (spec.transforms[name] as (v: unknown) => unknown)(raw)
      : raw;
    out[spec.aliases?.[name] ?? wireKey(name)] = mapped;
  }
}

/**
 * Declare a table-driven scene node. `tag` doubles as the wire `type`
 * discriminator; the generated builder walks the spec over the committed
 * props at serialization time.
 */
export function sceneNodeFromSpec<P extends ComponentBaseProps>(
  tag: string,
  spec: WireSpec
): (props: P) => React.ReactNode {
  const build: SceneBuilder<P> = (props, children) => {
    const p = props as Record<string, unknown>;
    const out: Record<string, unknown> = { type: tag, id: p.id };
    switch (spec.childSlot ?? 'list') {
      case 'list':
        out.children = children.map(fragmentToComponent);
        break;
      case 'one':
        if (children.length !== 1) {
          throw new Error(`<${tag}> requires exactly one child, got ${children.length}`);
        }
        out.child = fragmentToComponent(children[0]);
        break;
      case 'join':
        out.text = children.map(c => (typeof c === 'string' ? c : String(c))).join('');
        break;
      case 'none':
        break;
    }
    emitFields(out, p, spec.rootFields ?? [], spec);
    emitFields(out, p.style as Record<string, unknown> | undefined,
               spec.styleFields ?? [], spec);
    for (const [key, value] of Object.entries(spec.defaults ?? {})) {
      if (out[key] === undefined) out[key] = value;
    }
    return out as unknown as Api.Component;
  };
  return sceneNode<P>(tag, build);
}
