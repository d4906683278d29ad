/**
 * React reconciler that renders a Smelter component tree into wire-format
 * scene JSON. Runs react-reconciler in persistent mode: host instances are
 * immutable HostComponent nodes carrying each component's sceneBuilder;
 * `Renderer.scene()` walks the committed tree and serializes it.
 */
// eslint-disable-next-line import/no-named-as-default
import Reconciler from 'react-reconciler';
import { DefaultEventPriority, LegacyRoot } from 'react-reconciler/constants';
import type React from 'react';
import type { Api, _smelterInternals } from '@smelter-tpu/smelter';
import type { Logger } from './logger.js';

type SceneBuilder<P> = _smelterInternals.SceneBuilder<P>;
type SceneComponent = _smelterInternals.SceneComponent;

export class HostComponent {
  public props: object;
  public sceneBuilder: SceneBuilder<object>;
  public children: (Instance | TextInstance)[] = [];

  constructor(props: object, sceneBuilder: SceneBuilder<object>) {
    this.props = props;
    this.sceneBuilder = sceneBuilder;
  }

  public scene(): Api.Component {
    const children = this.children.map(child =>
      typeof child === 'string' ? child : child.scene()
    );
    return this.sceneBuilder(this.props, mergeAdjacentStrings(children));
  }
}

/** Adjacent text children collapse into one string (JSX interpolation). */
function mergeAdjacentStrings(components: SceneComponent[]): SceneComponent[] {
  const merged: SceneComponent[] = [];
  let run: string | null = null;
  for (const component of components) {
    if (typeof component === 'string') {
      run = run === null ? component : run + component;
    } else {
      if (run !== null) {
        merged.push(run);
        run = null;
      }
      merged.push(component);
    }
  }
  if (run !== null) {
    merged.push(run);
  }
  return merged;
}

type Type = string;
type Props = {
  props: object;
  sceneBuilder: SceneBuilder<object>;
};
type RootContainer = Renderer;
type HostContext = object;
type Instance = HostComponent;
type TextInstance = string;
type ChildSet = Array<string | Instance>;
type Timeout = ReturnType<typeof setTimeout>;

const HostConfig: Reconciler.HostConfig<
  Type,
  Props,
  RootContainer,
  Instance,
  TextInstance,
  void,
  void,
  Instance,
  HostContext,
  object,
  ChildSet,
  Timeout,
  -1
> = {
  getPublicInstance(instance: Instance | TextInstance) {
    return instance as Instance;
  },
  getRootHostContext() {
    return null;
  },
  getChildHostContext(parentHostContext: HostContext) {
    return parentHostContext;
  },
  prepareForCommit() {
    return null;
  },
  resetAfterCommit(rootContainer: RootContainer): void {
    rootContainer.onCommit();
  },
  createInstance(type: Type, props: Props): HostComponent {
    if (type !== 'smelter') {
      throw new Error(`Unknown host element type ${type}`);
    }
    return new HostComponent(props.props, props.sceneBuilder);
  },
  appendInitialChild(parent: Instance, child: Instance | TextInstance): void {
    parent.children.push(child);
  },
  finalizeInitialChildren(): boolean {
    return false;
  },
  prepareUpdate(
    _instance: Instance,
    _type: Type,
    _oldProps: Props,
    newProps: Props
  ): object | null {
    return newProps;
  },
  shouldSetTextContent(): boolean {
    return false;
  },
  createTextInstance(text: string): TextInstance {
    return text;
  },

  scheduleTimeout: setTimeout,
  cancelTimeout: clearTimeout,
  noTimeout: -1,
  isPrimaryRenderer: true,
  warnsIfNotActing: true,
  supportsMutation: false,
  supportsPersistence: true,
  supportsHydration: false,

  getInstanceFromNode() {
    throw new Error('getInstanceFromNode not implemented');
  },
  beforeActiveInstanceBlur() {},
  afterActiveInstanceBlur() {},
  preparePortalMount() {
    throw new Error('preparePortalMount not implemented');
  },
  prepareScopeUpdate() {
    throw new Error('prepareScopeUpdate not implemented');
  },
  getInstanceFromScope() {
    throw new Error('getInstanceFromScope not implemented');
  },
  getCurrentEventPriority(): Reconciler.Lane {
    return DefaultEventPriority;
  },
  detachDeletedInstance() {},

  // persistent-mode tree updates: clone instead of mutate
  cloneInstance(
    instance: Instance,
    _updatePayload: object | null,
    _type: Type,
    _oldProps: Props,
    newProps: Props,
    _handle: unknown,
    keepChildren: boolean
  ) {
    const clone = new HostComponent(newProps.props, newProps.sceneBuilder);
    if (keepChildren) {
      clone.children = [...instance.children];
    }
    return clone;
  },
  cloneHiddenInstance(_instance: Instance, _type: Type, props: Props): Instance {
    return new HostComponent(props.props, props.sceneBuilder);
  },
  cloneHiddenTextInstance(_instance: Instance, text: string): TextInstance {
    return text;
  },
  createContainerChildSet(): ChildSet {
    return [];
  },
  appendChildToContainerChildSet(childSet: ChildSet, child: Instance | TextInstance) {
    childSet.push(child);
  },
  finalizeContainerChildren() {},
  replaceContainerChildren(rootContainer: RootContainer, newChildren: ChildSet) {
    const root = newChildren[0];
    if (root === undefined) {
      return;
    }
    if (root instanceof HostComponent) {
      rootContainer.setRootComponent(root);
    } else {
      rootContainer.logger.warn('Expected HostComponent as root (text received)');
    }
  },
};

const SmelterReconciler = Reconciler(HostConfig);

type RendererOptions = {
  rootElement: React.ReactElement;
  onUpdate: () => void;
  idPrefix: string;
  logger: Logger;
};

export default class Renderer {
  public readonly logger: Logger;
  private rootNode: ReturnType<typeof SmelterReconciler.createContainer>;
  private onUpdate: () => void;
  private rootComponent?: HostComponent;

  constructor({ rootElement, onUpdate, idPrefix, logger }: RendererOptions) {
    this.logger = logger;
    this.onUpdate = onUpdate;
    this.rootNode = SmelterReconciler.createContainer(
      this,
      LegacyRoot,
      null,
      false,
      null,
      idPrefix,
      (error: unknown) => logger.error(error),
      null
    );
    SmelterReconciler.updateContainer(rootElement, this.rootNode, null, () => undefined);
  }

  /** Called by the host config after every commit. */
  public onCommit(): void {
    this.onUpdate();
  }

  public setRootComponent(root: HostComponent): void {
    this.rootComponent = root;
  }

  public scene(): Api.Component {
    return this.rootComponent ? this.rootComponent.scene() : { type: 'view' };
  }

  public stop(): void {
    SmelterReconciler.updateContainer(null, this.rootNode, null, () => undefined);
  }
}
