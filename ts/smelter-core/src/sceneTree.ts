/**
 * React integration: keeps a mutable record tree in sync with the user's
 * element tree and serializes it to wire-format scene JSON on demand.
 *
 * Design (contrast with the reference SDK, which runs react-reconciler in
 * persistent/clone mode over host instances that carry their serializer
 * closures): this host runs in MUTATION mode over plain data records.
 * An instance is just `{ tag, props, kids }` — the wire serializer is
 * looked up by tag in the @smelter-tpu/smelter scene registry at
 * serialization time. Mutation mode keeps the same record alive across
 * prop updates, which gives every node a free stable identity (`uid`)
 * that serves as the fallback component id for transition matching — no
 * per-component useId plumbing needed.
 */
// eslint-disable-next-line import/no-named-as-default
import Reconciler from 'react-reconciler';
import { DefaultEventPriority, LegacyRoot } from 'react-reconciler/constants';
import type React from 'react';
import type { Api } from '@smelter-tpu/smelter';
import { _smelterInternals } from '@smelter-tpu/smelter';
import type { Logger } from './logger.js';

const { HOST_PREFIX, builderFor } = _smelterInternals;
type SceneFragment = _smelterInternals.SceneFragment;

let nextUid = 1;

/** A committed scene element: tag + serializable props + children. */
export type SceneRecord = {
  kind: 'node';
  tag: string;
  props: Record<string, unknown>;
  kids: SceneChild[];
  uid: number;
};

export type TextRecord = { kind: 'text'; text: string };
export type SceneChild = SceneRecord | TextRecord;

function newRecord(tag: string, props: Record<string, unknown>): SceneRecord {
  const { children: _ignored, ...rest } = props;
  return { kind: 'node', tag, props: rest, kids: [], uid: nextUid++ };
}

/** Serialize a record subtree bottom-up, merging adjacent text runs. */
function serializeRecord(record: SceneRecord): Api.Component {
  const fragments: SceneFragment[] = [];
  for (const kid of record.kids) {
    if (kid.kind === 'text') {
      const last = fragments.length - 1;
      if (last >= 0 && typeof fragments[last] === 'string') {
        fragments[last] = (fragments[last] as string) + kid.text;
      } else {
        fragments.push(kid.text);
      }
    } else {
      fragments.push(serializeRecord(kid));
    }
  }
  // stable fallback id (record identity) for transition matching
  const props =
    record.props.id === undefined
      ? { ...record.props, id: `#sm${record.uid}` }
      : record.props;
  return builderFor(record.tag)(props, fragments);
}

type Container = { roots: SceneChild[]; tree: SceneTree };

function dropChild(list: SceneChild[], child: SceneChild): void {
  const at = list.indexOf(child);
  if (at >= 0) {
    list.splice(at, 1);
  }
}

function placeBefore(list: SceneChild[], child: SceneChild, anchor: SceneChild): void {
  dropChild(list, child);
  const at = list.indexOf(anchor);
  list.splice(at < 0 ? list.length : at, 0, child);
}

function tagOf(type: string): string {
  if (!type.startsWith(HOST_PREFIX)) {
    throw new Error(
      `Unknown host element <${type}>: only Smelter components may appear ` +
        'in an output tree'
    );
  }
  return type.slice(HOST_PREFIX.length);
}

/* eslint-disable @typescript-eslint/no-unused-vars */
const hostConfig: Reconciler.HostConfig<
  string, // Type
  Record<string, unknown>, // Props
  Container,
  SceneRecord, // Instance
  TextRecord, // TextInstance
  never, // SuspenseInstance
  never, // HydratableInstance
  SceneRecord, // PublicInstance
  null, // HostContext
  Record<string, unknown>, // UpdatePayload = next props
  never, // ChildSet (persistence only)
  ReturnType<typeof setTimeout>,
  -1
> = {
  supportsMutation: true,
  supportsPersistence: false,
  supportsHydration: false,
  isPrimaryRenderer: true,
  warnsIfNotActing: false,
  noTimeout: -1,
  scheduleTimeout: setTimeout,
  cancelTimeout: clearTimeout,

  getRootHostContext: () => null,
  getChildHostContext: parent => parent,
  getPublicInstance: instance => instance as SceneRecord,
  shouldSetTextContent: () => false,

  createInstance: (type, props) => newRecord(tagOf(type), props),
  createTextInstance: text => ({ kind: 'text', text }),

  appendInitialChild: (parent, child) => {
    parent.kids.push(child);
  },
  appendChild: (parent, child) => {
    dropChild(parent.kids, child);
    parent.kids.push(child);
  },
  insertBefore: (parent, child, anchor) => {
    placeBefore(parent.kids, child, anchor);
  },
  removeChild: (parent, child) => {
    dropChild(parent.kids, child);
  },
  appendChildToContainer: (container, child) => {
    dropChild(container.roots, child);
    container.roots.push(child);
  },
  insertInContainerBefore: (container, child, anchor) => {
    placeBefore(container.roots, child, anchor);
  },
  removeChildFromContainer: (container, child) => {
    dropChild(container.roots, child);
  },
  clearContainer: container => {
    container.roots.length = 0;
  },

  finalizeInitialChildren: () => false,
  prepareUpdate: (_instance, _type, _old, next) => next,
  // react-reconciler 0.29 mutation signature:
  // (instance, payload, type, prevProps, nextProps, handle)
  commitUpdate: (instance, payload) => {
    const { children: _ignored, ...rest } = payload;
    instance.props = rest;
  },
  commitTextUpdate: (textInstance, _old, next) => {
    textInstance.text = next;
  },
  resetTextContent: () => undefined,
  commitMount: () => undefined,

  prepareForCommit: () => null,
  resetAfterCommit: container => {
    container.tree.notifyCommit();
  },

  hideInstance: () => undefined,
  unhideInstance: () => undefined,
  hideTextInstance: () => undefined,
  unhideTextInstance: () => undefined,

  preparePortalMount: () => undefined,
  getCurrentEventPriority: () => DefaultEventPriority,
  getInstanceFromNode: () => null,
  getInstanceFromScope: () => null,
  beforeActiveInstanceBlur: () => undefined,
  afterActiveInstanceBlur: () => undefined,
  prepareScopeUpdate: () => undefined,
  detachDeletedInstance: () => undefined,
};
/* eslint-enable @typescript-eslint/no-unused-vars */

const reactHost = Reconciler(hostConfig as never);

export type SceneTreeOptions = {
  onCommit: () => void;
  logger: Logger;
};

/** A mounted output tree: render side-effects in, scene JSON out. */
export class SceneTree {
  private container: Container;
  private fiberRoot: unknown;
  private onCommit: () => void;
  private logger: Logger;

  constructor(element: React.ReactElement, options: SceneTreeOptions) {
    this.onCommit = options.onCommit;
    this.logger = options.logger;
    this.container = { roots: [], tree: this };
    this.fiberRoot = reactHost.createContainer(
      this.container,
      LegacyRoot,
      null,
      false,
      null,
      'sm',
      (error: unknown) => this.logger.error(error),
      null
    );
    reactHost.updateContainer(element, this.fiberRoot as never, null, null);
  }

  /** Invoked by the host config after every committed mutation batch. */
  public notifyCommit(): void {
    this.onCommit();
  }

  /** Serialize the current committed tree. */
  public snapshot(): Api.Component {
    const root = this.container.roots.find(
      (child): child is SceneRecord => child.kind === 'node'
    );
    if (!root) {
      return { type: 'view' };
    }
    return serializeRecord(root);
  }

  public unmount(): void {
    reactHost.updateContainer(null, this.fiberRoot as never, null, null);
  }
}
